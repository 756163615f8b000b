"""Real-robot backend (camera capture + command stub).

Duck-typed to the same k_* protocol as the sim backend, mirroring
/root/reference/gym_kmanip/env_real.py:14-79. Contract fixes over the
reference (documented in SURVEY.md §2.1 #4): the reference's `new()` calls
`KManipEnvReal()` with no arguments although the class requires them
(env_real.py:79), and it reads `cam.device_id`/`cam.fps` fields that its Cam
dataclass does not define -- both fixed here (our Cam defines them,
constants.py).

cv2 capture runs in a background thread per camera (the reference uses
asyncio tasks); `q_command` remains a stub until a robot transport exists,
exactly like the reference's `pass` body (env_real.py:64-66).
"""

import threading
import time
from collections import OrderedDict as ODict
from typing import Dict, Optional

import numpy as np

from gym_kmanip_tpu import constants as k

try:  # pragma: no cover - hardware path
    import cv2

    HAS_CV2 = True
except ImportError:
    cv2 = None
    HAS_CV2 = False


class _CamReader:
    def __init__(self, cam: k.Cam):
        self.cam = cam
        self.frame = np.zeros((cam.h, cam.w, cam.c), dtype=cam.dtype)
        self._stop = False
        self._cap = None
        self._thread: Optional[threading.Thread] = None

    def start(self):
        if not HAS_CV2:
            return
        self._cap = cv2.VideoCapture(self.cam.device_id)
        self._cap.set(cv2.CAP_PROP_FRAME_WIDTH, self.cam.w)
        self._cap.set(cv2.CAP_PROP_FRAME_HEIGHT, self.cam.h)
        self._cap.set(cv2.CAP_PROP_FPS, self.cam.fps)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        period = 1.0 / max(self.cam.fps, 1)
        while not self._stop:
            ok, frame = self._cap.read()
            if ok:
                self.frame = frame[..., k.BGR_TO_RGB]
            time.sleep(period)

    def stop(self):
        self._stop = True
        if self._thread is not None:
            self._thread.join(timeout=1.0)
        if self._cap is not None:
            self._cap.release()


class KManipEnvReal:
    def __init__(self, gym_env):
        self.gym_env = gym_env
        self.readers: Dict[str, _CamReader] = {}
        for cam in gym_env.cameras:
            r = _CamReader(cam)
            r.start()
            self.readers[cam.name] = r
        self.t0 = time.time()

    def q_command(self, q_pos: np.ndarray) -> None:
        """Send a joint command to the robot. Stub, like the reference
        (env_real.py:64-66)."""

    def get_image(self, cam: k.Cam) -> np.ndarray:
        r = self.readers.get(cam.name)
        return r.frame if r is not None else np.zeros((cam.h, cam.w, cam.c), cam.dtype)

    # -- protocol ----------------------------------------------------------
    def k_reset(self):
        obs = self._obs()
        return False, 0.0, 1.0, obs, time.time() - self.t0

    def k_step(self, action):
        # decode + send the command when a transport exists
        self.q_command(np.zeros(self.gym_env.q_len))
        obs = self._obs()
        return False, 0.0, 1.0, obs, time.time() - self.t0

    def k_render(self, cam: k.Cam):
        return self.get_image(cam)

    def k_close(self):
        for r in self.readers.values():
            r.stop()

    def _obs(self):
        obs = ODict()
        for cam in self.gym_env.cameras:
            obs[cam.log_name] = self.get_image(cam)
        return obs


def new(gym_env) -> KManipEnvReal:
    return KManipEnvReal(gym_env)
