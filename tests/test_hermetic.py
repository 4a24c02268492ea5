"""drop_non_cpu_backends makes a fresh interpreter CPU-hermetic.

The guard exists for this environment's failure mode (docs/STATUS.md
gotchas): the axon-tunneled TPU plugin initializes whenever any backend
does, and during a tunnel outage that init hangs forever — wedging even
``jax.devices("cpu")``. The subprocess below re-creates the dangerous
configuration (the plugin's sitecustomize on PYTHONPATH when present)
and must come back with CPU devices within the timeout whether the
tunnel is up, down, or absent.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import jax
from text_segmentation_image_inpainting_tpu.utils.hermetic import drop_non_cpu_backends

trimmed = drop_non_cpu_backends()
devs = jax.devices()
assert trimmed, "registry trim failed in a fresh interpreter"
assert devs and all(d.platform == "cpu" for d in devs), devs

# The trim must not deregister platform NAMES: pallas and checkify (via
# optax->chex) register MLIR lowerings for platform 'tpu' at import time
# and crash if 'tpu' left known_platforms() (round-3 regression).
import jax.experimental.pallas  # noqa: F401
import optax  # noqa: F401

# And the package's model path must trace end-to-end under the trim —
# ConvBNAct consults ops.depthwise.supports() on every trace.
import jax.numpy as jnp
from text_segmentation_image_inpainting_tpu.models.text_segmentation import TextSegmenter

model = TextSegmenter()
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
logits = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
assert logits.shape == (1, 64, 64, 1), logits.shape
print("HERMETIC-OK", len(devs))
"""


def test_fresh_interpreter_gets_cpu_devices_without_touching_other_backends():
    env = dict(os.environ)
    # Re-create the production hazard when this machine has the axon
    # plugin site; elsewhere this still exercises the trim + CPU init.
    axon_site = "/root/.axon_site"
    pypath = [REPO] + ([axon_site] if os.path.isdir(axon_site) else [])
    env["PYTHONPATH"] = os.pathsep.join(pypath)
    env.pop("JAX_PLATFORMS", None)  # the guard must not need it either way
    out = subprocess.run(
        [sys.executable, "-c", _CHILD],
        env=env,
        capture_output=True,
        text=True,
        timeout=180,
    )
    assert out.returncode == 0, (out.stdout, out.stderr)
    assert "HERMETIC-OK" in out.stdout
