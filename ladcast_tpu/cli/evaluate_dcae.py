"""DCAE reconstruction evaluation CLI.

Equivalent of the reference evaluate/evaluate_encdec_model.py:69-271:
per-year reconstruction metrics of the autoencoder -- lat-weighted
relative L2 (LpLoss) plus per-channel UNNORMALIZED lat-weighted RMSE --
written as CSV.
"""

from __future__ import annotations

import argparse
import csv
import os

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu import channels as ch, static_data
from ladcast_tpu.config import DCAEConfig
from ladcast_tpu.data import transforms
from ladcast_tpu.metrics.losses import lp_loss
from ladcast_tpu.metrics.weights import grid_lat_weights
from ladcast_tpu.models.dcae import AutoencoderDC


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="ERA5 zarr or .npz bundle")
    ap.add_argument("--dcae_params", required=True)
    ap.add_argument("--output_csv", required=True)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--max_samples", type=int, default=None)
    ap.add_argument("--split", default=None,
                    help="reference WeatherDataset split to evaluate "
                         "(e.g. 2018..2022 for the per-year recon CSVs of "
                         "evaluate_encdec_model.py:69-271)")
    args = ap.parse_args(argv)

    from ladcast_tpu.cli.pred_rollout import open_field_source, \
        _load_any_params

    params, cfg = _load_any_params(args.dcae_params, "dcae", DCAEConfig())
    dcae = AutoencoderDC(cfg)
    statics = jnp.asarray(static_data.static_conditioning_tensor(layout="HWC"))
    fm, fs = static_data.era5_mean_std()
    fm_j, fs_j = jnp.asarray(fm), jnp.asarray(fs)
    lat_w = jnp.asarray(grid_lat_weights("cos"), jnp.float32)

    @jax.jit
    def _recon_metrics(p, raw):
        x = transforms.normalize(raw, fm_j, fs_j)
        nan_mask = jnp.isnan(x[..., ch.SST_CHANNEL_INDEX])
        x = jnp.where(jnp.isnan(x), -2.0, x)
        y = dcae.apply(p, x, statics)  # statics stripped on decode
        m = nan_mask[..., None] & (jnp.arange(x.shape[-1])
                                   == ch.SST_CHANNEL_INDEX)
        y = jnp.where(m, -2.0, y)
        x = jnp.where(m, -2.0, x)
        B, H, W, C = x.shape
        lw = lat_w.reshape(1, H, 1, 1)
        rel = lp_loss(y, x, jnp.broadcast_to(lw, (B, H, 1, 1)))
        # unnormalized per-channel lat-weighted RMSE
        err_phys = (y - x) * fs_j  # undo z-scoring scale
        rmse = jnp.sqrt(jnp.mean(lw * err_phys**2, axis=(0, 1, 2)))
        return rel, rmse

    def recon_metrics(raw):
        return _recon_metrics(params, raw)

    src, ts_all = open_field_source(args.data, split=args.split)
    ts_all = list(ts_all)
    if args.max_samples:
        ts_all = ts_all[: args.max_samples]

    rels, rmses = [], []
    for s in range(0, len(ts_all), args.batch_size):
        raw = src.frames_at(ts_all[s:s + args.batch_size])
        rel, rmse = recon_metrics(jnp.asarray(raw, jnp.float32))
        rels.append(float(rel))
        rmses.append(np.asarray(rmse))
        print(f"evaluated {min(s + args.batch_size, len(ts_all))}"
              f"/{len(ts_all)}", flush=True)

    rmse_mean = np.mean(np.stack(rmses), axis=0)
    os.makedirs(os.path.dirname(os.path.abspath(args.output_csv)),
                exist_ok=True)
    with open(args.output_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["channel", "lat_weighted_rmse"])
        for name, v in zip(ch.channel_names(), rmse_mean):
            w.writerow([name, float(v)])
        w.writerow(["lat_weighted_rel_l2", float(np.mean(rels))])
    print(f"wrote {args.output_csv}")


if __name__ == "__main__":
    main()
