"""Probe: does an int8 conv HLO beat bf16 at the DCAE decode shapes?

Decision gate for extending the opt-in int8 path into the decoder
(PERFORMANCE.md round 4): the decode convs run HBM-bound at low MXU
utilization, so the hypothetical win comes from halving activation
bytes, not from the 2x int8 MXU. This measures three things per shape:

  1. bf16 conv (the production path);
  2. pure int8 conv with PRE-quantized operands (upper bound: what the
     conv itself saves when all quantization is free);
  3. int8 conv including a per-tensor dynamic quantization of the
     activation (the realistic standalone cost: one amax reduction +
     one quantize pass; in a real decoder the quantize would need to
     fuse into the producer's epilogue to beat this).

If (2) is not clearly faster than (1), the idea is dead and gets a
negative-result entry. No reference equivalent (reference decodes in
fp32/bf16).
"""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# (x_shape NHWC, C_out, k): the two high-res decode stages dominate
SHAPES = [
    ((20, 120, 240, 252), 252, 3),
    ((20, 60, 120, 504), 504, 3),
    ((20, 60, 120, 504), 1008, 3),
]


def timeit(f, *args, n=20):
    # sync by fetching a scalar -- block_until_ready does not actually
    # wait through the axon tunnel (see CLAUDE.md)
    float(jnp.sum(f(*args).astype(jnp.float32)))  # compile + warm
    t0 = time.time()
    o = None
    for _ in range(n):
        o = f(*args)
    float(jnp.sum(o.astype(jnp.float32)))
    return (time.time() - t0) / n * 1e3


def main():
    dn = ("NHWC", "HWIO", "NHWC")
    for (shape, cout, k) in SHAPES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
        w = jnp.asarray(rng.randn(k, k, shape[-1], cout), jnp.bfloat16) * 0.1

        @jax.jit
        def conv_bf16(a, b):
            return jax.lax.conv_general_dilated(
                a, b, (1, 1), "SAME", dimension_numbers=dn)

        xq = jnp.asarray(rng.randint(-127, 128, shape), jnp.int8)
        wq = jnp.asarray(rng.randint(-127, 128, (k, k, shape[-1], cout)),
                         jnp.int8)

        @jax.jit
        def conv_int8(a, b):
            return jax.lax.conv_general_dilated(
                a, b, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)

        @jax.jit
        def conv_int8_dynq(a, b):
            af = a.astype(jnp.float32)
            s = jnp.max(jnp.abs(af)) / 127.0
            aq = jnp.round(af / s).astype(jnp.int8)
            acc = jax.lax.conv_general_dilated(
                aq, b, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * s).astype(jnp.bfloat16)

        t_bf = timeit(conv_bf16, x, w)
        try:
            t_i8 = timeit(conv_int8, xq, wq)
            t_i8q = timeit(conv_int8_dynq, x, wq)
            print(f"{shape}->{cout}: bf16 {t_bf:.2f} ms | int8(prequant) "
                  f"{t_i8:.2f} ms ({t_bf/t_i8:.2f}x) | int8(+dyn quant) "
                  f"{t_i8q:.2f} ms ({t_bf/t_i8q:.2f}x)", flush=True)
        except Exception as e:  # int8 conv may not lower on this backend
            print(f"{shape}->{cout}: bf16 {t_bf:.2f} ms | int8 conv "
                  f"FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
