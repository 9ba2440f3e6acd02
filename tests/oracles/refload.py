"""Load reference modules from /root/reference with the diffusers shim
installed, so the ACTUAL reference torch code (not a transcription)
serves as the parity oracle.

Loadable oracle targets: the torch model files (LaDCast_3D_model, DCAE,
sphere_conv, embeddings, evaluate.utils lat-weight helpers) AND -- since
the round-3 scheduler shim -- the sampler/pipeline stack
(pipelines.edm_sampler, pipelines.pipeline_AR, pipelines.utils
ensemble_AR_sampler, models.utils Karras_sigmas_lognormal). Training
scripts still need accelerate and are not oracle targets.
"""

from __future__ import annotations

import importlib
import sys
import types

REF_ROOT = "/root/reference"


def _stub_module(name: str, **attrs):
    if name not in sys.modules:
        import importlib.machinery
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        m.__shim__ = True
        # a None __spec__ makes importlib.util.find_spec raise ValueError
        # from unrelated probes (e.g. torch._dynamo trace_rules scans)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = m


def load_reference(module: str):
    """Import e.g. 'ladcast.models.LaDCast_3D_model' from /root/reference."""
    from tests.oracles import diffusers_shim

    diffusers_shim.install()
    # xarray is absent from this image; reference dataloader/pipeline
    # modules import it at module scope and reference xr.Dataset in
    # def-time-evaluated signatures, but the oracle code paths exercised
    # here (samplers, models, transforms on torch tensors) never touch it.
    try:
        import xarray  # noqa: F401
    except ImportError:
        from tests.oracles import fake_xarray
        # Functional Dataset/DataArray stand-ins: enough surface for the
        # reference latent_ens_to_xarr to execute as an oracle
        # (tests/test_oracle_export.py); other oracle paths only need the
        # names to exist for def-time-evaluated signatures.
        _stub_module("xarray",
                     Dataset=fake_xarray.OracleDataset,
                     DataArray=fake_xarray.OracleDataArray)
    # cartopy is likewise absent; evaluate/track.py imports it at module
    # scope but touches it only inside plotting bodies the oracles never
    # call. tests/oracles/fake_xarray.py supplies the xarray surface the
    # tracker actually exercises.
    try:
        import cartopy  # noqa: F401
    except ImportError:
        _stub_module("cartopy")
        _stub_module("cartopy.crs")
        _stub_module("cartopy.feature")
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    return importlib.import_module(module)


def state_dict_numpy(model) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
