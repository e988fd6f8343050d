"""Dual-chain LSTM forward experiment (diagnosis only).

diag_lstm_kernel.py showed the fwd kernel is bound by neither MXU
throughput, VPU transcendentals, HBM, nor grid-count — the signature of
dependent-op latency: each grid step's g1 -> cell1 -> g2 -> cell2 chain
serializes the MXU and VPU against each other.

Hypothesis: processing TWO independent batch half-tiles per grid step as
explicit separate chains lets Mosaic's scheduler overlap chain A's VPU
cell ops with chain B's matmuls (a bigger single tile does NOT: its
stages stay strictly serial, which is why the bt512/bt1024 probes were
flat). Run: python -c "import sys; sys.path.insert(0,'/root/repo');
exec(open('misc/diag_lstm_dualchain.py').read()); main()"
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(np.asarray(x).ravel()[0])


def best_of(fn, *args, reps=5):
    sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _fwd_kernel_dual(xg1_ref, w1h_ref, w2x_ref, w2h_ref, b2_ref,
                     tops_ref, resid_ref, h2last_ref,
                     h1, c1, h2, c2, *, hid, mm, chains):
    from pytorch_scalablefhvae_tpu.ops.lstm_pallas import _cell_fwd

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        for buf in (h1, c1, h2, c2):
            buf[:] = jnp.zeros_like(buf)

    def dot(a, w):
        if mm is not None:
            a, w = a.astype(mm), w.astype(mm)
        return jnp.dot(a, w, preferred_element_type=jnp.float32)

    w1h, w2x, w2h, b2 = w1h_ref[:], w2x_ref[:], w2h_ref[:], b2_ref[:]
    bt = xg1_ref.shape[0]
    half = bt // chains
    outs = []
    for k in range(chains):
        s = slice(k * half, (k + 1) * half)
        g1 = xg1_ref[s, :] + dot(h1[s, :], w1h)
        h1n, c1n = _cell_fwd(g1, c1[s, :], hid)
        g2 = dot(h1n, w2x) + dot(h2[s, :], w2h) + b2
        h2n, c2n = _cell_fwd(g2, c2[s, :], hid)
        outs.append((s, h1n, c1n, h2n, c2n))
    for s, h1n, c1n, h2n, c2n in outs:
        h1[s, :], c1[s, :], h2[s, :], c2[s, :] = h1n, c1n, h2n, c2n
        tops_ref[s, :] = h2n
        resid_ref[s, :] = jnp.concatenate([h1n, c1n, c2n], axis=1)
        h2last_ref[s, :] = h2n


def fwd_dual(xg1, w1h, w2x, w2h, b2, bt, mm, T, chains):
    hid = w1h.shape[0]
    H4 = 4 * hid
    B = xg1.shape[0] // T
    n_bt = B // bt
    const = lambda i, t: (0, 0)  # noqa: E731
    step = lambda i, t: (t * n_bt + i, 0)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_fwd_kernel_dual, hid=hid, mm=mm, chains=chains),
        grid=(n_bt, T),
        in_specs=[
            pl.BlockSpec((bt, H4), step, memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, H4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, H4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, H4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), const, memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((T * B, hid), jnp.float32),
            jax.ShapeDtypeStruct((T * B, 3 * hid), jnp.float32),
            jax.ShapeDtypeStruct((B, hid), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((bt, hid), step, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 3 * hid), step, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, hid), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((bt, hid), jnp.float32) for _ in range(4)],
    )(xg1, w1h, w2x, w2h, b2.reshape(1, H4))


def main():
    from pytorch_scalablefhvae_tpu.models.fhvae import init_lstm_stack
    import pytorch_scalablefhvae_tpu.ops.lstm_pallas as LP

    B, T, H = 1024, 20, 128
    ITERS = 32
    p = init_lstm_stack(jax.random.PRNGKey(0), H, (H, H))
    c0, c1 = p["cells"]
    w1h = c0["w"][H:]
    rng = np.random.default_rng(0)
    # precomputed time-major gates, as the real kernel receives them
    xg1 = jax.device_put(
        rng.standard_normal((T * B, 4 * H)).astype(np.float32))

    def bench(name, fn):
        def f(xg1):
            def body(c, _):
                tops, resid, h2 = fn(xg1)
                return c + tops[0, 0] + h2[0, 0], None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
            return c

        dt = best_of(jax.jit(f), xg1) / ITERS
        print(f"{name:40s} {dt*1e3:7.3f} ms/call {B/dt/1e3:8.1f} kseg/s",
              flush=True)
        return dt

    mm = jnp.bfloat16
    for bt, chains in [(256, 1), (512, 1), (512, 2), (1024, 1), (1024, 2),
                       (1024, 4), (256, 2)]:
        bench(f"fwd dual bt{bt} chains{chains}",
              lambda x, bt=bt, ch=chains: fwd_dual(
                  x, w1h, c1["w"][:H], c1["w"][H:], c1["b"], bt, mm, T, ch))
    # reference: the production fwd kernel via its public wrapper
    ref = LP._fwd_call(xg1, w1h, c1["w"][:H], c1["w"][H:], c1["b"],
                       256, False, mm, False, T)
    bench("fwd production bt256",
          lambda x: LP._fwd_call(x, w1h, c1["w"][:H], c1["w"][H:], c1["b"],
                                 256, False, mm, False, T))
    del ref


if __name__ == "__main__":
    main()
