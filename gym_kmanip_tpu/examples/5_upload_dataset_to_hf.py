"""Push a recorded HDF5 dataset to the HuggingFace hub.

Analog of /root/reference/gym_kmanip/examples/5_upload_dataset_to_hf.py:
17-34 (lerobot `push_dataset_to_hub` with the aloha_hdf5 raw format). The
episode files written by gym_kmanip_tpu.log.log_h5py follow the same ACT
layout, so the same ingestion path applies.
"""

import os

from gym_kmanip_tpu import constants as k

HF_USER: str = os.environ.get("HF_USER", "kscale")
DATA_DIR: str = os.environ.get("KMANIP_DATA_DIR", k.DATA_DIR)
DATASET_NAME: str = os.environ.get("KMANIP_DATASET", "test")


def main():
    try:
        from lerobot.scripts.push_dataset_to_hub import push_dataset_to_hub
    except ImportError:
        raise SystemExit(
            "lerobot is not installed in this image; install it on a "
            "network-connected machine to upload datasets."
        )
    push_dataset_to_hub(
        data_dir=DATA_DIR,
        dataset_id=DATASET_NAME,
        raw_format="aloha_hdf5",
        community_id=HF_USER,
        fps=k.FPS,
        video=False,
    )


if __name__ == "__main__":
    main()
