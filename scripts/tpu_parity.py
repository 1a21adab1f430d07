"""On-device numerics parity: the demo render + refine paths, TPU vs CPU.

BASELINE configs #1/#2 demand pixel/gradient accuracy on the ACTUAL
device numerics (bf16 MXU passes — the hazard the HIGHEST-precision pins
in ops/splat.py:84-97 and ops/projection.py:21-28 exist to defeat). The
CPU fp32 outputs are themselves golden-tested against the PyTorch
reference (tests/test_golden_demo_render.py, test_renderer.py,
test_refine.py), so TPU-vs-CPU max|Δ| here closes the chain
TPU -> CPU -> torch reference (sdfrenderer/main.py:62-121).

Two programs, both at production defaults on each backend (TPU runs the
fused Pallas splat + Pallas stage-1 selection; CPU runs the dense
oracles):

  A. demo render (render_sdf geometry): bundled demo decoder, 40^3 grid,
     latent [1,0,0], y-90 pose at z=10, 200x100 disc render ->
     color/mask/normals/depth images + grads of sum(color^2) w.r.t.
     (pose, latent) through decoder + isosurface + renderer.
  B. refinement: 5 full engine iterations at reference crop scale
     (32x32, capacity 4096) -> loss trajectory + final
     {yaw, trans, scale, latent}.

Usage:
  python scripts/tpu_parity.py            # CPU subprocess + TPU run,
                                          # prints the max|Δ| table
  SDFLABEL_PARITY_DUMP=out.npz python scripts/tpu_parity.py --compute
                                          # just dump this backend's arrays
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def compute() -> dict:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from sdflabel_tpu.engine import refine as refine_mod
    from sdflabel_tpu.models import deepsdf
    from sdflabel_tpu.ops import grid as grid_ops
    from sdflabel_tpu.renderer import Rasterer, rasterer as rast_mod

    on_tpu = jax.default_backend() == "tpu"
    out = {"backend": np.asarray(jax.default_backend())}

    cfg, params = deepsdf.load_torch_checkpoint(
        os.path.join(REPO, "data", "optimization", "deepsdf_demo.pt"))
    decoder = deepsdf.sdf_fn(cfg, params)
    grid_pts = grid_ops.generate_point_grid(40)
    latent0 = jnp.zeros((cfg.latent_size,), jnp.float32).at[0].set(1.0)

    # ---- A: demo render fwd + grads (sdfrenderer/main.py:62-121) -------
    pose0 = np.eye(4, dtype=np.float32)
    pose0[:3, :3] = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32)
    pose0[:3, 3] = [0.0, 0.0, 10.0]
    rast = Rasterer(None, (200, 100))

    def render(latent, pose):
        surf, _ = grid_ops.surface_from_decoder(
            decoder, latent, grid_pts, capacity=4096)
        rendering, _ = rast(
            surf.points, surf.normals, surf.normals, pose,
            point_mask=surf.mask, rot="dcm", primitives="disc",
            output_nocs=True)
        return rendering

    @jax.jit
    def demo_fwd(latent, pose):
        r = render(latent, pose)
        return r.color, r.mask, r.normals, r.depth

    @jax.jit
    def demo_grads(latent, pose):
        def loss_fn(lat, p):
            return jnp.sum(render(lat, p).color ** 2)

        loss, (g_lat, g_pose) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))(latent, pose)
        return loss, g_lat, g_pose

    color, mask, normals, depth = demo_fwd(latent0, jnp.asarray(pose0))
    out["demo_color"] = np.asarray(color)
    out["demo_mask"] = np.asarray(mask)
    out["demo_normals"] = np.asarray(normals)
    out["demo_depth"] = np.asarray(depth)
    loss, g_lat, g_pose = demo_grads(latent0, jnp.asarray(pose0))
    out["demo_loss"] = np.asarray(loss)
    out["demo_g_latent"] = np.asarray(g_lat)
    out["demo_g_pose"] = np.asarray(g_pose)

    # ---- B: refine iterations at reference scale -----------------------
    select = None
    if on_tpu:  # production default: Pallas stage-1 selection on TPU
        from sdflabel_tpu.ops import mlp_pallas

        select = mlp_pallas.pallas_select_fn(cfg, params)
    rcfg = refine_mod.RefineConfig(iters=5, surface_capacity=4096)
    K = jnp.asarray(rast_mod.calibration_matrix((32, 32)))
    refine_fn = jax.jit(refine_mod.make_refine_fn(
        decoder, rcfg, grid_pts, K, (32, 32), select_decoder=select))
    rng = np.random.RandomState(0)
    params0 = refine_mod.init_refine_params(
        0.3, [0.0, 0.0, 4.0], 2.0, np.eye(1, cfg.latent_size)[0])
    nocs = jnp.asarray(rng.rand(3, 32, 32), jnp.float32)
    frustum = jnp.asarray(rng.randn(4096, 3) + [0, 0, 4.0], jnp.float32)
    fmask = jnp.ones((4096,), bool)
    final, hist = refine_fn(params0, nocs, frustum, fmask)
    out["refine_loss"] = np.asarray(hist.loss)
    out["refine_yaw"] = np.asarray(final.yaw)
    out["refine_trans"] = np.asarray(final.trans)
    out["refine_scale"] = np.asarray(final.scale)
    out["refine_latent"] = np.asarray(final.latent)

    # ---- C: Pallas selection kernel numerics at bench scale ------------
    # The 64-wide demo decoder falls back to XLA selection; the kernel's
    # contract (rank-only selection; bf16-operand/fp32-accumulate — the
    # numerics class of XLA's default TPU matmuls) is pinned here on the
    # 8x512 bench architecture: TPU kernel sdf vs CPU fp32 decode, plus
    # the top-4096 band overlap computed at compare time.
    bcfg = deepsdf.DeepSDFConfig(
        latent_size=3, dims=(512,) * 8, norm_layers=tuple(range(8)),
        latent_in=(4,), weight_norm=True)
    bparams = deepsdf.init_params(bcfg, jax.random.PRNGKey(0))
    blat = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    if on_tpu:
        from sdflabel_tpu.ops import mlp_pallas

        sel_fn = mlp_pallas.pallas_select_fn(bcfg, bparams)
        assert sel_fn is not None
        out["select_sdf"] = np.asarray(jax.jit(sel_fn)(blat, grid_pts))
    else:
        bdec = deepsdf.sdf_fn(bcfg, bparams)
        out["select_sdf"] = np.asarray(jax.jit(bdec)(blat, grid_pts))
    return out


def compare(cpu: dict, tpu: dict):
    rows = []
    for key in sorted(cpu.keys()):
        if key == "backend":
            continue
        a, b = np.asarray(cpu[key], np.float64), np.asarray(
            tpu[key], np.float64)
        d = np.abs(a - b)
        dmax = float(np.max(d)) if a.size else 0.0
        ref = float(np.max(np.abs(a))) if a.size else 0.0
        # fraction of elements off by more than 1e-3 absolute: separates
        # "a handful of footprint-boundary pixel flips" (documented fused
        # splat behavior, test_splat_pallas.py) from systematic error
        frac = float(np.mean(d > 1e-3)) if a.size else 0.0
        rows.append((key, dmax, ref, frac))
    # band overlap of the selection kernel's rank contract
    a, b = cpu["select_sdf"], tpu["select_sdf"]
    k = 4096
    band_a = set(np.argsort(np.abs(a))[:k].tolist())
    band_b = set(np.argsort(np.abs(b))[:k].tolist())
    rows.append(("select_band_overlap_top4096",
                 len(band_a & band_b) / k, 1.0, 0.0))
    return rows


def main():
    if "--compute" in sys.argv:
        out = compute()
        np.savez(os.environ.get("SDFLABEL_PARITY_DUMP", "parity.npz"), **out)
        print(f"dumped {len(out)} arrays "
              f"({np.asarray(out['backend'])})", flush=True)
        return

    cpu_npz = "/tmp/parity_cpu.npz"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv.append('--compute');"
        f"sys.path.insert(0, {REPO!r});"
        "import runpy; runpy.run_path("
        f"{os.path.abspath(__file__)!r}, run_name='__main__')"
    )
    env = dict(os.environ, SDFLABEL_PARITY_DUMP=cpu_npz)
    print("# computing CPU (fp32 oracle) arrays in a subprocess...",
          flush=True)
    r = subprocess.run([sys.executable, "-c", code], env=env, timeout=1800)
    assert r.returncode == 0, "CPU parity subprocess failed"

    print("# computing on this process's backend (TPU)...", flush=True)
    tpu = compute()
    np.savez("/tmp/parity_tpu.npz",
             **{k: np.asarray(v) for k, v in tpu.items()})
    cpu = dict(np.load(cpu_npz, allow_pickle=False))

    rows = compare(cpu, tpu)
    print("\n| array | max abs delta | max abs (cpu) | frac > 1e-3 |")
    print("|---|---|---|---|")
    for key, dmax, ref, frac in rows:
        print(f"| {key} | {dmax:.3e} | {ref:.3e} | {frac:.2e} |")


if __name__ == "__main__":
    main()
