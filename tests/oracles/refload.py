"""Load reference model modules from /root/reference with the diffusers
shim installed, so the ACTUAL reference torch code (not a transcription)
serves as the parity oracle.

Only torch-level model files are loadable this way (LaDCast_3D_model,
DCAE, sphere_conv, embeddings, and the evaluate.utils lat-weight helpers);
pipeline/training files additionally need accelerate/xarray data plumbing
and are not oracle targets.
"""

from __future__ import annotations

import importlib
import sys
import types

REF_ROOT = "/root/reference"


def _stub_module(name: str):
    if name not in sys.modules:
        m = types.ModuleType(name)
        m.__shim__ = True
        sys.modules[name] = m


def load_reference(module: str):
    """Import e.g. 'ladcast.models.LaDCast_3D_model' from /root/reference."""
    from tests.oracles import diffusers_shim

    diffusers_shim.install()
    # ladcast.evaluate.utils imports xarray at module scope but the
    # lat-weight helpers the models need are numpy/torch-only.
    try:
        import xarray  # noqa: F401
    except ImportError:
        _stub_module("xarray")
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    return importlib.import_module(module)


def state_dict_numpy(model) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
