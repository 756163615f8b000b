"""Demonstrate the axon runtime's closure-capture slow mode (round 3 find).

Observed on the tunneled TPU v5e backend: after this process executes ONE
jitted program whose closure captured a pre-existing DEVICE array as a
constant, EVERY subsequent dispatch — of any program — costs a fixed
~25-35 ms instead of the normal sub-ms, for the life of the process. The
trigger is the capture, not size (an 8-element array flips it) and not
the op (happens with a plain multiply). Host constants (python scalars /
numpy arrays, including `jnp.asarray(np_array)` INSIDE the traced
function) are baked into the HLO as literals and never trigger it;
device arrays passed as ARGUMENTS never trigger it either.

Control matrix measured 2026-08-19 (probe = a 200-iteration scan of
PRNG draws, total ms per dispatch):

    fresh process, no capture                      0.4 ms   fast
    execute jit w/ uploaded 64KB ARG               0.5 ms   fast
    jit w/ numpy closure constant (512KB)          0.6 ms   fast
    jnp.asarray(np) INSIDE traced fn               0.4 ms   fast
    jit w/ DEVICE closure constant (4x4!)         30.5 ms   SLOW
    jit w/ DEVICE closure constant (50x50)        35.4 ms   SLOW

Repo rule enforced by tests/test_no_device_closures.py: factory
functions (make_*) and module scope keep constants in numpy; jnp
conversions happen inside traced functions.

Before the fix (CostParams defaults + contacts._CORNERS were module-level
jnp arrays) the headline MPPI bench paid the slow mode on every dispatch:
the H=50 K=256 solve measured 0.33 ms/solve marginal but ~30 ms/dispatch
fixed. Run this script on the TPU to confirm current behavior:

    python tools/exp_closure_capture.py
"""

import subprocess
import sys
import textwrap

CASES = {
    "baseline_no_capture": "",
    "device_closure_const": (
        "C = jnp.asarray(np.ones((4, 4), np.float32))\n"
        "f = jax.jit(lambda x: x * C)\n"
        "jax.block_until_ready(f(jnp.ones((4, 4), jnp.float32)))\n"
    ),
    "numpy_closure_const": (
        "C = np.ones((4, 4), np.float32)\n"
        "f = jax.jit(lambda x: x * C)\n"
        "jax.block_until_ready(f(jnp.ones((4, 4), jnp.float32)))\n"
    ),
    "device_array_as_arg": (
        "C = jnp.asarray(np.ones((4, 4), np.float32))\n"
        "f = jax.jit(lambda x, c: x * c)\n"
        "jax.block_until_ready(f(jnp.ones((4, 4), jnp.float32), C))\n"
    ),
}

TEMPLATE = """
import time, jax, jax.numpy as jnp, numpy as np
{setup}
@jax.jit
def probe(key):
    def body(k_, _):
        k_, sub = jax.random.split(k_)
        xi = jax.random.normal(sub, (256, 50, 10), dtype=jnp.float32)
        return k_, jnp.sum(xi.transpose(1, 0, 2))
    return jax.lax.scan(body, key, None, length=200)

out = probe(jax.random.PRNGKey(0)); jax.block_until_ready(out)
best = 1e9
for _ in range(3):
    t0 = time.time()
    out = probe(jax.random.PRNGKey(0)); jax.block_until_ready(out)
    best = min(best, time.time() - t0)
print(f"{{best * 1e3:.1f}}")
"""


def main():
    print(f"{'case':26s} {'probe dispatch':>14s}  verdict")
    for name, setup in CASES.items():
        code = TEMPLATE.format(setup=textwrap.dedent(setup))
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=300,
        )
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "ERR"
        try:
            ms = float(line)
            verdict = "SLOW" if ms > 5.0 else "fast"
        except ValueError:
            ms, verdict = float("nan"), f"error: {r.stderr.strip()[-120:]}"
        print(f"{name:26s} {ms:11.1f} ms  {verdict}")


if __name__ == "__main__":
    main()
