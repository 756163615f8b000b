"""Build hook: compile the native C++ host-IK library at install time.

The runtime (gym_kmanip_tpu/native/__init__.py) looks for the prebuilt
`ik_native_prebuilt.so` next to the module first, then falls back to a
g++-on-demand build under ~/.cache, then to the pure-numpy solver — so
this step is OPTIONAL: installs on g++-less machines still succeed, they
just lose the ~130-260x host-IK speedup until g++ appears.

All project metadata lives in pyproject.toml; this file only adds the
native build to `pip install`.
"""

import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildPyWithNativeIK(build_py):
    def run(self):
        super().run()
        here = os.path.dirname(os.path.abspath(__file__))
        src = os.path.join(here, "gym_kmanip_tpu", "native", "ik_native.cpp")
        out_dir = os.path.join(self.build_lib, "gym_kmanip_tpu", "native")
        out = os.path.join(out_dir, "ik_native_prebuilt.so")
        try:
            os.makedirs(out_dir, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                 "-o", out, src],
                check=True, capture_output=True, text=True, timeout=600,
            )
            print(f"built native IK -> {out}")
        except Exception as e:  # noqa: BLE001 - optional build, never fatal
            print(f"native IK build skipped ({e}); the package will "
                  f"g++-on-demand at first use or fall back to numpy")


setup(cmdclass={"build_py": BuildPyWithNativeIK})
