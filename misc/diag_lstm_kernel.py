"""Diagnose the Pallas LSTM recurrence bottleneck on the attached TPU.

Answers, with direct A/B timings at the flagship config (b1024, T=20,
H=128), which resource bounds ops/lstm_pallas.py:

- fwd-only vs fwd+bwd cost split;
- bf16 vs fp32 matmul operands (no delta => not MXU-bound);
- a LINEAR-GATES diagnostic build (transcendentals replaced by cheap
  affine ops — WRONG MATH, diagnosis only: a big delta => VPU
  transcendental-bound);
- block_batch sweep (grid-overhead sensitivity).

Run: python misc/diag_lstm_kernel.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


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


def main():
    import pytorch_scalablefhvae_tpu.ops.lstm_pallas as LP
    from pytorch_scalablefhvae_tpu.models.fhvae import init_lstm_stack

    B, T, D, H = 1024, 20, 80, 128
    ITERS = 32
    p = init_lstm_stack(jax.random.PRNGKey(0), D, (H, H))
    rng = np.random.default_rng(0)
    xs = jax.device_put(rng.standard_normal((B, T, D)).astype(np.float32))

    def run_case(name, mm, bt, fwd_only):
        def f(xs):
            def body(c, _):
                if fwd_only:
                    seq, h = LP.lstm2_pallas(p, xs, block_batch=bt,
                                             mm_dtype=mm)
                    return c + jnp.sum(seq[:, -1, 0]) + jnp.sum(h[:, 0]), None

                def loss(x):
                    seq, h = LP.lstm2_pallas(p, x, block_batch=bt,
                                             mm_dtype=mm)
                    return jnp.sum(seq**2) + jnp.sum(h**2)

                return c + jax.grad(loss)(xs)[0, 0, 0], None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
            return c

        jf = jax.jit(f)
        dt = best_of(jf, xs) / ITERS
        segs = B / dt
        print(f"{name:34s} {dt*1e3:7.3f} ms/call  {segs/1e3:8.1f} kseg/s",
              flush=True)
        return dt

    print(f"config: B={B} T={T} D={D} H={H}, {ITERS} calls/dispatch")
    run_case("fwd+bwd bf16-mm bt256", jnp.bfloat16, 256, False)
    run_case("fwd+bwd fp32-mm bt256", None, 256, False)
    run_case("fwd-only bf16-mm bt256", jnp.bfloat16, 256, True)
    run_case("fwd-only fp32-mm bt256", None, 256, True)
    for bt in (128, 512, 1024):
        run_case(f"fwd+bwd bf16-mm bt{bt}", jnp.bfloat16, bt, False)

    # --- linear-gates diagnostic: patch the cell with cheap affine ops
    orig_sig, orig_tanh = LP._sigmoid, jnp.tanh

    LP._sigmoid = lambda x: jnp.clip(0.25 * x + 0.5, 0.0, 1.0)
    saved_cell_fwd = LP._cell_fwd

    def cell_fwd_lin(gates, c_prev, hid):
        i = LP._sigmoid(gates[:, :hid])
        f = LP._sigmoid(gates[:, hid: 2 * hid])
        g = jnp.clip(gates[:, 2 * hid: 3 * hid], -1.0, 1.0)
        o = LP._sigmoid(gates[:, 3 * hid:])
        c_new = f * c_prev + i * g
        h_new = o * jnp.clip(c_new, -1.0, 1.0)
        return h_new, c_new

    LP._cell_fwd = cell_fwd_lin
    try:
        run_case("fwd-only LINEAR-GATES bt256 (diag)", jnp.bfloat16, 256,
                 True)
    finally:
        LP._sigmoid, LP._cell_fwd = orig_sig, saved_cell_fwd


if __name__ == "__main__":
    main()
