"""On-device ensemble scorer (evaluate_ens.make_score_fn) on a tiny DCAE.

Input latents follow the reference ``latent_*.npy`` contract: PHYSICAL
latent scale (roll_out_serial inverse-transforms before storing,
pipelines/utils.py:565-573); decoded fields are unnormalized to physical
units before scoring (decode_latent_ens semantics, utils.py:51-80).
Metric values cross-checked against a plain-numpy reimplementation and
against the reference scoring-loop composition.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu.cli.evaluate_ens import make_score_fn
from ladcast_tpu.metrics.weights import cos_lat_weights
from ladcast_tpu.models.dcae import AutoencoderDC
from tests.test_dcae import TINY as TINY_DCAE

H, W, E, T, SST = 16, 32, 3, 2, 5


def _setup(seed):
    """Tiny DCAE + physical latents/truth/climate + non-trivial field
    stats (so the decoded-field unnormalization is actually pinned)."""
    cfg = dataclasses.replace(TINY_DCAE)  # 4-ch latent, 8-ch fields
    dcae = AutoencoderDC(cfg)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(1, H, W, 8), jnp.float32)
    st = jnp.asarray(rng.randn(H, W, 1), jnp.float32)
    params = dcae.init(jax.random.PRNGKey(0), x, st)

    lat_phys = jnp.asarray(rng.randn(E, T, 2, 4, 4) * 0.5, jnp.float32)
    fm = rng.randn(8).astype(np.float32)
    fs = (rng.rand(8) + 0.5).astype(np.float32)
    truth = (rng.randn(T, H, W, 8) * fs + fm).astype(np.float32)
    truth[:, 0, 0, SST] = np.nan  # SST-style NaN
    climate = (rng.randn(T, H, W, 8) * fs + fm).astype(np.float32)

    lat = np.linspace(-88.5, 90, H)
    lat_w = jnp.asarray(cos_lat_weights(lat), jnp.float32)
    score = make_score_fn(dcae, params, lat_w, field_stats=(fm, fs))
    m = score(lat_phys, jnp.asarray(truth), jnp.asarray(climate))

    # identical decoded PHYSICAL fields, computed independently
    dec = np.stack([
        np.asarray(dcae.apply(params, lat_phys[e],
                              method=AutoencoderDC.decode))
        for e in range(E)])  # (E, T, H, W, 8) normalized
    dec = dec * fs + fm      # physical
    return m, dec, truth, climate, lat, np.asarray(lat_w)


def test_score_fn_matches_numpy():
    m, dec, truth, _, _, lat_w = _setup(0)
    for k in ("ens_mean_mse", "crps", "acc"):
        assert m[k].shape == (8, T)
        assert np.isfinite(np.asarray(m[k])).all()

    # numpy cross-check of the ens-mean MSE for one channel
    w = lat_w.reshape(H, 1)
    c = 2
    want = np.nanmean(
        w * (dec[:, :, :, :, c].mean(0) - truth[..., c]) ** 2, axis=(-2, -1))
    np.testing.assert_allclose(np.asarray(m["ens_mean_mse"][c]), want,
                               rtol=5e-4, atol=1e-5)
    assert np.abs(np.asarray(m["acc"])).max() <= 1.0 + 1e-5


def test_score_fn_matches_reference_loop_composition():
    """Pin make_score_fn against the reference scoring loop
    (evaluate_ens_gpu.py:339-419) composed from the ACTUAL reference
    metric functions (evaluate/utils.py get_acc /
    pointwise_crps_{spread,skill}): lat-weight placement, skill-0.5*spread
    total, and the SST-channel nanmean split, per (channel, lead time),
    on identical decoded physical fields.
    """
    import torch

    from tests.oracles.refload import load_reference

    eutils = load_reference("ladcast.evaluate.utils")
    m, dec, truth, climate, lat, _ = _setup(1)

    ref_w = torch.from_numpy(
        eutils.get_normalized_lat_weights_based_on_cos(lat)
    ).view(1, -1, 1).float()           # (1, H, 1), as the reference loop

    def _split_mean(field):            # (C, H, W) -> (C,), SST nanmean
        out = field.mean(dim=(1, 2))
        out[SST] = torch.nanmean(field[SST])
        return out

    for t in range(T):
        dec_t = torch.from_numpy(np.moveaxis(dec[:, t], -1, 1))  # (E,C,H,W)
        ref_t = torch.from_numpy(np.moveaxis(truth[t], -1, 0))   # (C,H,W)
        clim_t = torch.from_numpy(np.moveaxis(climate[t], -1, 0))

        mean_t = dec_t.mean(dim=0)
        acc_t = eutils.get_acc(mean_t, ref_t, clim_t, ref_w)
        se_t = (mean_t - ref_t) ** 2 * ref_w
        spread_t = eutils.pointwise_crps_spread(dec_t, ensemble_dim=0) * ref_w
        skill_t = eutils.pointwise_crps_skill(dec_t, ref_t.unsqueeze(0), 0) \
            * ref_w
        crps_t = skill_t - 0.5 * spread_t

        np.testing.assert_allclose(np.asarray(m["acc"])[:, t],
                                   acc_t.numpy(), rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m["ens_mean_mse"])[:, t],
                                   _split_mean(se_t).numpy(),
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m["crps"])[:, t],
                                   _split_mean(crps_t).numpy(),
                                   rtol=2e-4, atol=1e-5)


def test_score_fn_ens_mesh_matches_unsharded():
    """make_score_fn(ens_mesh=...) shards members over the 8-device
    virtual mesh through the decode; E=3 is NOT divisible by 8, so this
    also pins that GSPMD's internal padding leaves every metric
    unchanged (vs the unsharded scorer, up to fp32 reassociation)."""
    from ladcast_tpu.parallel.mesh import make_mesh

    cfg = dataclasses.replace(TINY_DCAE)
    dcae = AutoencoderDC(cfg)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, H, W, 8), jnp.float32)
    st = jnp.asarray(rng.randn(H, W, 1), jnp.float32)
    params = dcae.init(jax.random.PRNGKey(0), x, st)

    lat_phys = jnp.asarray(rng.randn(E, T, 2, 4, 4) * 0.5, jnp.float32)
    fm = rng.randn(8).astype(np.float32)
    fs = (rng.rand(8) + 0.5).astype(np.float32)
    truth = (rng.randn(T, H, W, 8) * fs + fm).astype(np.float32)
    truth[:, 0, 0, SST] = np.nan
    climate = (rng.randn(T, H, W, 8) * fs + fm).astype(np.float32)
    lat = np.linspace(-88.5, 90, H)
    lat_w = jnp.asarray(cos_lat_weights(lat), jnp.float32)

    kw = dict(field_stats=(fm, fs), diagnostics=True)
    ref = make_score_fn(dcae, params, lat_w, **kw)(
        lat_phys, jnp.asarray(truth), jnp.asarray(climate))
    got = make_score_fn(dcae, params, lat_w, ens_mesh=make_mesh("ens"),
                        **kw)(
        lat_phys, jnp.asarray(truth), jnp.asarray(climate))
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)


def test_filter_latent_files():
    """Scorer date-range bounds: init in [start, end - total_lead]
    (reference evaluate_ens_gpu.py:83-89, 213-215)."""
    from ladcast_tpu.cli.evaluate_ens import filter_latent_files

    files = [f"/x/latent_{t}.npy" for t in
             (2018010100, 2018061500, 2018123012, 2018123112)]
    assert filter_latent_files(files) == files
    got = filter_latent_files(files, start_date="2018-06-01")
    assert got == files[1:]
    # end 2018-12-31 with a 240 h lead: init must be <= 12-21 00z
    got = filter_latent_files(files, end_date="2018-12-31",
                              total_lead_time_hour=240)
    assert got == files[:2]
    # a date-only end lands at 00z: the 12-31 12z init is out of range
    got = filter_latent_files(files, start_date="2018-06-01",
                              end_date="2018-12-31")
    assert got == files[1:3]
    got = filter_latent_files(files, start_date="2018-06-01",
                              end_date="2018-12-31T12")
    assert got == files[1:]


def test_derive_lead_budget_from_artifacts(tmp_path):
    """--end_date without --total_lead_time_hour reserves the horizon
    implied by the latent files themselves (init <= end - T*step,
    evaluate_ens_gpu.py:213-215) instead of silently reserving zero."""
    from ladcast_tpu.cli.evaluate_ens import derive_lead_budget

    f = tmp_path / "latent_2018010100.npy"
    np.save(f, np.zeros((2, 4, 5, 3, 3), np.float32))  # T+1 = 5 frames
    # explicit flag wins; empty file list passes through
    assert derive_lead_budget([str(f)], True, 6, 240) == 240
    assert derive_lead_budget([], True, 6, None) is None
    # crop_init (default): 4 lead frames * 6 h
    assert derive_lead_budget([str(f)], True, 6) == 24
    # --no_crop_init files carry no init frame: all 5 frames are leads
    assert derive_lead_budget([str(f)], False, 6) == 30
