"""Dense conv: XLA conv HLO vs Pallas implicit GEMM at the DCAE decoder
main-conv shapes (the 35-45%-MXU decode bound, PERFORMANCE.md)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ladcast_tpu.ops.pallas import dense_conv as dc

# (x_shape, cout, ksz): every decoder main conv at the B=20 chunk.
SHAPES = [
    ((20, 15, 30, 84), 1008, 3),
    ((20, 15, 30, 1008), 2016, 3),
    ((20, 30, 60, 504), 2016, 3),
    ((20, 60, 120, 504), 504, 3),
    ((20, 60, 120, 504), 1008, 3),
    ((20, 120, 240, 252), 252, 3),
    ((20, 120, 240, 252), 89, 3),
]


def timed(name, f, *args, flops=None):
    g = jax.jit(f)
    out = g(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.time()
    for _i in range(30):
        out = g(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.time() - t0) / 30
    extra = f"  ({flops / dt / 197e12 * 100:5.1f}% MXU)" if flops else ""
    print(f"{name:>52s}: {dt * 1e3:6.2f} ms{extra}", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    tot_hlo = tot_pl = 0.0
    for (shape, cout, ksz) in SHAPES:
        B, H, W, Cin = shape
        p = ksz // 2
        pads = ((p, p), (p, p))
        x = jnp.asarray(rng.randn(*shape), jnp.bfloat16) * 0.3
        k = jnp.asarray(rng.randn(ksz, ksz, Cin, cout), jnp.bfloat16) * 0.2
        flops = B * H * W * Cin * cout * ksz * ksz * 2
        plan = dc._plan(shape, k.shape, pads, 2)
        t_hlo = timed(f"conv HLO   {shape}->{cout}",
                      lambda a, b: dc._xla_dense(a, b, pads), x, k,
                      flops=flops)
        tot_hlo += t_hlo
        if plan is None:
            # Production dispatch (_use_pallas) falls back to XLA here;
            # count the HLO time so the totals stay comparable.
            print(f"{'pallas GEMM ' + str(shape):>52s}: no plan "
                  "(XLA fallback in production)", flush=True)
            tot_pl += t_hlo
        else:
            tot_pl += timed(f"pallas GEMM {shape}->{cout} plan={plan}",
                            lambda a, b: dc._pallas_dense(a, b, pads), x, k,
                            flops=flops)
        if dc._plan(shape, k.shape, pads, 2, circular_w=True) is not None:
            timed(f"pallas circular-W {shape}->{cout}",
                  lambda a, b: dc._pallas_dense(a, b, pads, circular_w=True),
                  x, k, flops=flops)
        timed(f"HLO circular-W (wrap concat) {shape}->{cout}",
              lambda a, b: dc._xla_dense_circular(a, b, pads), x, k,
              flops=flops)
    print(f"{'TOTAL conv HLO':>52s}: {tot_hlo * 1e3:6.2f} ms")
    print(f"{'TOTAL pallas':>52s}: {tot_pl * 1e3:6.2f} ms")


if __name__ == "__main__":
    main()
