"""Encode an ERA5 archive through the frozen DCAE into a latent dataset.

Equivalent of the reference preprocecss/encode_data.py:19-225 (direct
xarray path): normalize + SST-mask each snapshot, encode with statics in
device-batched chunks, and write latents (time, 84, 15, 30) -- to zarr
when xarray/zarr are available, else to an ``.npz`` bundle consumable by
the AR trainer.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu import static_data
from ladcast_tpu.config import DCAEConfig
from ladcast_tpu.data import transforms
from ladcast_tpu.models.dcae import AutoencoderDC


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True,
                    help="ERA5 zarr, .npz bundle, or monthly-tar dir")
    ap.add_argument("--dcae_params", required=True)
    ap.add_argument("--output", required=True, help=".zarr or .npz path")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--start_date", default=None,
                    help="YYYY-MM-DD[Thh]: encode only timestamps >= this "
                         "(reference encode_data.py --start_date)")
    ap.add_argument("--end_date", default=None,
                    help="YYYY-MM-DD[Thh]: encode only timestamps <= this")
    args = ap.parse_args(argv)

    from ladcast_tpu.cli.pred_rollout import _load_any_params, \
        open_field_source

    # open the source and resolve the timestamp range BEFORE the (slow)
    # checkpoint load so usage errors fail fast.
    # npz bundle / zarr store / monthly-tar dir (tar reads go through the
    # native member reader when available)
    src, timestamps = open_field_source(args.data)
    fields = getattr(src, "fields", None) \
        if args.data.endswith(".npz") else None  # npz is in-RAM already
    timestamps = np.asarray(timestamps, np.int64)
    if args.start_date or args.end_date:
        from ladcast_tpu.data import time_utils
        lo, hi = time_utils.date_bounds(args.start_date, args.end_date)
        keep = (timestamps >= lo) & (timestamps <= hi)
        if fields is not None:
            fields = fields[keep]
        timestamps = timestamps[keep]
        if len(timestamps) == 0:
            raise SystemExit(
                f"no timestamps in range [{lo}, {hi}] -- the source "
                "covers none of --start_date/--end_date")

    n = len(timestamps)
    if n == 0:
        raise SystemExit("source contains no timestamps to encode")

    params, cfg = _load_any_params(args.dcae_params, "dcae", DCAEConfig())
    dcae = AutoencoderDC(cfg)
    static = jnp.asarray(static_data.static_conditioning_tensor(layout="HWC"))
    fm, fs = static_data.era5_mean_std()

    @jax.jit
    def _encode(p, batch):
        x = transforms.normalize(batch, jnp.asarray(fm), jnp.asarray(fs))
        x = jnp.where(jnp.isnan(x), -2.0, x)
        return dcae.apply(p, x, static, method=AutoencoderDC.encode)

    def encode(batch):
        # params explicit: captured trees overflow remote compile requests
        return _encode(params, batch)

    lats = []
    for s in range(0, n, args.batch_size):
        ts_chunk = timestamps[s:s + args.batch_size]
        if fields is not None:
            batch = fields[s:s + args.batch_size]
        else:
            batch = src.frames_at(ts_chunk)
        lats.append(np.asarray(encode(jnp.asarray(batch, jnp.float32))))
        print(f"encoded {min(s + args.batch_size, n)}/{n}", flush=True)
    latents = np.concatenate(lats)  # (time, 15, 30, 84)

    if args.output.endswith(".npz"):
        np.savez(args.output, latents=latents, timestamps=timestamps)
    else:
        import pandas as pd
        import xarray as xr
        da = xr.DataArray(
            np.moveaxis(latents, -1, 1),  # reference layout (time, C, H, W)
            dims=("time", "C", "H", "W"),
            coords={"time": pd.to_datetime([str(t) for t in timestamps],
                                           format="%Y%m%d%H")},
            name="latents")
        da.to_dataset().to_zarr(args.output, mode="w")
    print(f"wrote {args.output}: {latents.shape}")


if __name__ == "__main__":
    main()
