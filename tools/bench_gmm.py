"""GMM log-likelihood: Pallas kernel vs XLA scan, on hardware.

VERDICT round-1 asked the Pallas GMM kernel to earn its place: measure
throughput and memory at K in {100, 150}, B=128, and tune (row tiles, bf16
matmuls with f32 accumulation). All timed variants reduce to a scalar so the
axon tunnel fetch (~30 ms) does not pollute device timing; device time is
measured with the launch-N/one-fetch protocol. Params travel as jit
ARGUMENTS — the MDN weights are ~470 MB and closure captures would be
serialized into the axon remote-compile payload.

Run:  PYTHONPATH=.:/root/.axon_site python tools/bench_gmm.py
"""

from __future__ import annotations

import time

import numpy as np

B, P, D = 128, 196, 768
ITERS = 4
WARMUP = 1


def device_time(fn, *args, iters=ITERS, warmup=WARMUP):
    """Launch iters executions back-to-back, fetch one scalar at the end:
    total ~= iters * exec + one tunnel roundtrip."""
    import jax.numpy as jnp

    for _ in range(warmup):
        np.asarray(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    s = float(np.asarray(sum(jnp.sum(o) for o in outs)))
    dt = (time.perf_counter() - t0) / iters
    return dt, s


def mem_stats(device):
    try:
        st = device.memory_stats()
        return st.get("peak_bytes_in_use")
    except Exception:
        return None


def main():
    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.models.mdn import GaussianMDN
    from vit_ad_tpu.ops.gmm import fused_log_likelihood
    from vit_ad_tpu.ops.pallas.gmm import gmm_log_likelihood_pallas

    accel = [d for d in jax.devices() if d.platform != "cpu"]
    device = accel[0] if accel else jax.devices()[0]
    print(f"device: {device}  rows={B*P} D={D}", flush=True)

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((B, P, D)).astype(np.float32), device)

    @jax.jit
    def xla_f32(x, pr):
        return fused_log_likelihood(
            x, pr["w_pi"], pr["b_pi"], pr["w_sigma"], pr["b_sigma"],
            pr["w_mu"], pr["b_mu"],
        ).sum()

    def mk_pallas(mmdt, tile):
        @jax.jit
        def f(x, pr):
            xf = x.astype(jnp.float32)
            logits = jnp.einsum(
                "bpd,dk->bpk", xf, pr["w_pi"].astype(jnp.float32)
            ) + pr["b_pi"]
            log_pi = jnp.log(jax.nn.softmax(logits, axis=-1) + 1e-15)
            return gmm_log_likelihood_pallas(
                xf, log_pi,
                jnp.moveaxis(pr["w_sigma"], -1, 0),
                jnp.moveaxis(pr["b_sigma"], -1, 0),
                jnp.moveaxis(pr["w_mu"], -1, 0),
                jnp.moveaxis(pr["b_mu"], -1, 0),
                row_tile=tile, matmul_dtype=mmdt,
            ).sum()
        return f

    for K in (100, 150):
        mdn = GaussianMDN(features=D, num_gaussians=K)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            params = mdn.init(jax.random.key(0), jnp.zeros((1, P, D), jnp.float32))
        pr = jax.device_put(params["params"], device)
        flops = 4 * B * P * D * D * K  # the 2 head matmuls fwd

        variants = [("xla scan f32 (k_chunk=8)", xla_f32)]
        for name, mmdt, tile in (
            ("pallas f32 tile=256", jnp.float32, 256),
            ("pallas f32 tile=512", jnp.float32, 512),
            ("pallas bf16 tile=256", jnp.bfloat16, 256),
            ("pallas bf16 tile=512", jnp.bfloat16, 512),
        ):
            variants.append((name, mk_pallas(mmdt, tile)))

        ref = None
        print(f"\n--- K={K}  ({flops/1e12:.1f} TFLOP/batch fwd) ---", flush=True)
        for name, fn in variants:
            try:
                dt, s = device_time(fn, x, pr)
            except Exception as e:
                print(f"{name:28s} FAILED {type(e).__name__}: {str(e)[:120]}",
                      flush=True)
                continue
            if ref is None:
                ref = s / ITERS
            err = abs(s / ITERS - ref) / max(1.0, abs(ref))
            peak = mem_stats(device)
            peak_s = f" peak={peak/1e9:.2f}GB" if peak else ""
            print(
                f"{name:28s} {dt*1e3:9.1f} ms  {B/dt:7.1f} img/s "
                f"{flops/dt/1e12:6.1f} TFLOPS  relerr={err:.2e}{peak_s}",
                flush=True,
            )


if __name__ == "__main__":
    main()
