"""Bisect which bf16 dot form this Mosaic toolchain rejects ("Bad lhs
type", seen in the fused wide-layer bwd kernel). Each case compiles a
minimal one-block kernel."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BF16 = jnp.bfloat16
F32 = jnp.float32
_T_RHS = (((1,), (1,)), ((), ()))
_T_LHS = (((0,), (0,)), ((), ()))


def run(name, kernel, shapes, out_shape):
    x = [jnp.asarray(np.random.default_rng(0).normal(size=s), F32) for s in shapes]
    try:
        r = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(shapes),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, F32),
        )(*x)
        jax.block_until_ready(r)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:140]}", flush=True)


B, N, G = 16, 128, 512

run(
    "plain bf16 dot (B,N)@(N,G)",
    lambda a, b, o: o.__setitem__(
        slice(None),
        jnp.dot(a[:].astype(BF16), b[:].astype(BF16), preferred_element_type=F32),
    ),
    [(B, N), (N, G)],
    (B, G),
)
run(
    "T_RHS bf16 (B,G)x(N,G)->(B,N)",
    lambda a, b, o: o.__setitem__(
        slice(None),
        jax.lax.dot_general(
            a[:].astype(BF16), b[:].astype(BF16), _T_RHS, preferred_element_type=F32
        ),
    ),
    [(B, G), (N, G)],
    (B, N),
)
run(
    "T_LHS bf16 (B,N)x(B,G)->(N,G)",
    lambda a, b, o: o.__setitem__(
        slice(None),
        jax.lax.dot_general(
            a[:].astype(BF16), b[:].astype(BF16), _T_LHS, preferred_element_type=F32
        ),
    ),
    [(B, N), (B, G)],
    (N, G),
)
run(
    "T_LHS via .T bf16 (N,B)@(B,G)",
    lambda a, b, o: o.__setitem__(
        slice(None),
        jnp.dot(a[:].astype(BF16).T, b[:].astype(BF16), preferred_element_type=F32),
    ),
    [(B, N), (B, G)],
    (N, G),
)
run(
    "T_RHS f32 (B,G)x(N,G)->(B,N)",
    lambda a, b, o: o.__setitem__(
        slice(None),
        jax.lax.dot_general(a[:], b[:], _T_RHS, preferred_element_type=F32),
    ),
    [(B, G), (N, G)],
    (B, N),
)
run(
    "T_LHS f32 (B,N)x(B,G)->(N,G)",
    lambda a, b, o: o.__setitem__(
        slice(None),
        jax.lax.dot_general(a[:], b[:], _T_LHS, preferred_element_type=F32),
    ),
    [(B, N), (B, G)],
    (N, G),
)
run(
    "T_RHS mixed f32xbf16 (B,G)x(N,G)->(B,N)",
    lambda a, b, o: o.__setitem__(
        slice(None),
        jax.lax.dot_general(
            a[:], b[:].astype(BF16), _T_RHS, preferred_element_type=F32
        ),
    ),
    [(B, G), (N, G)],
    (B, N),
)


def run2(name, kernel, shapes, out_shape, scratch):
    x = [jnp.asarray(np.random.default_rng(0).normal(size=s), F32) for s in shapes]
    try:
        r = pl.pallas_call(
            kernel,
            grid=(2,),
            in_specs=[pl.BlockSpec(s, lambda t: (0,) * len(s), memory_space=pltpu.VMEM) for s in shapes],
            out_specs=pl.BlockSpec(out_shape, lambda t: (0,) * len(out_shape), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, F32),
            scratch_shapes=[pltpu.VMEM(s, F32) for s in scratch],
        )(*x)
        jax.block_until_ready(r)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:140]}", flush=True)


def k_acc(a_ref, b_ref, o_ref, acc):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jax.lax.dot_general(
        a_ref[:].astype(BF16), b_ref[:].astype(BF16), _T_LHS,
        preferred_element_type=F32,
    )
    o_ref[:] = acc[:]


run2("acc += T_LHS bf16", k_acc, [(B, N), (B, G)], (N, G), [(N, G)])


def k_where(a_ref, b_ref, o_ref):
    t = pl.program_id(0)
    a = jnp.where(t == 1, 0.0, a_ref[:])
    o_ref[:] = jnp.dot(a.astype(BF16), b_ref[:].astype(BF16),
                       preferred_element_type=F32)


run2("where-masked lhs bf16 dot", k_where, [(B, N), (N, G)], (B, G), [])


def k_where_acc(a_ref, b_ref, o_ref, acc):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    a = jnp.where(t == 1, 0.0, a_ref[:])
    acc[:] += jax.lax.dot_general(
        a.astype(BF16), b_ref[:].astype(BF16), _T_LHS,
        preferred_element_type=F32,
    )
    o_ref[:] = acc[:]


run2("where + acc += T_LHS bf16", k_where_acc, [(B, N), (B, G)], (N, G), [(N, G)])
