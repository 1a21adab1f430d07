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

The table is GATED: every row carries an explicit threshold (set at 3-10x
the round-3 measured values, PARITY.md — enough headroom for fp-reorder
noise across kernel revisions, tight enough that a systematic numerics
regression fails the run). The structured verdict is written to
PARITY_rNN.json (--out) and the process exits nonzero on any failing row,
so the round driver catches numerics regressions mechanically instead of
a human re-reading prose (VERDICT r3 weak #3).

Gate design: the fused splat's documented contract allows footprint-
BOUNDARY pixel flips (test_splat_pallas.py), and a flipped pixel carries
full-scale color/depth deltas — so image rows gate on (a) the FLIP COUNT
(mask disagreements) and (b) the error distribution INSIDE the agreeing
footprint (p99.9), never on raw max|Δ|. Scalar/trajectory rows gate on
absolute or relative drift directly.

Usage:
  python scripts/tpu_parity.py [--out PARITY_r04.json]
                                          # CPU subprocess + TPU run,
                                          # prints the gated table,
                                          # exit 1 on any failing row
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


def _row(name, value, limit, op="<="):
    ok = value <= limit if op == "<=" else value >= limit
    return {"row": name, "value": float(value), "limit": float(limit),
            "op": op, "pass": bool(ok)}


def gate(cpu: dict, tpu: dict) -> list[dict]:
    """Thresholded parity verdicts. Limits are 3-10x the round-3 measured
    values (PARITY.md table): headroom for fp-reorder noise, failure on
    anything systematic."""
    rows = []

    # -- demo images: flip count + in-footprint distribution --------------
    mask_a = np.asarray(cpu["demo_mask"], np.float64) > 0.5
    mask_b = np.asarray(tpu["demo_mask"], np.float64) > 0.5
    flips = int(np.sum(mask_a != mask_b))
    agree = mask_a & mask_b  # (1, H, W) pixels both backends render
    # measured 20/20000 boundary flips; gate at 0.5% of the image
    rows.append(_row("demo_mask_flip_count", flips, mask_a.size * 0.005))

    for key, p999_lim in (("demo_color", 0.15), ("demo_depth", 0.1),
                          ("demo_normals", 0.3)):
        a = np.asarray(cpu[key], np.float64)
        b = np.asarray(tpu[key], np.float64)
        d = np.abs(a - b)
        # broadcast the (1, H, W) agreement mask over channels
        d_in = d[np.broadcast_to(agree, d.shape)]
        p999 = float(np.percentile(d_in, 99.9)) if d_in.size else 0.0
        # measured in-footprint p99.9: color 2.8e-2, depth ~1e-3 m,
        # normals dominated by softmax-weight sensitivity
        rows.append(_row(f"{key}_in_footprint_p99.9", p999, p999_lim))

    # -- demo scalars / gradients: relative drift -------------------------
    loss_rel = abs(float(cpu["demo_loss"]) - float(tpu["demo_loss"])) / max(
        abs(float(cpu["demo_loss"])), 1e-12)
    rows.append(_row("demo_loss_rel", loss_rel, 2e-3))  # measured 3.9e-4
    for key, lim in (("demo_g_latent", 0.15), ("demo_g_pose", 0.15)):
        a = np.asarray(cpu[key], np.float64)
        b = np.asarray(tpu[key], np.float64)
        rel = float(np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-12))
        rows.append(_row(f"{key}_rel", rel, lim))  # measured 2.8-3.9e-2

    # -- refinement trajectory: absolute drift ----------------------------
    for key, lim in (("refine_loss", 2e-3), ("refine_yaw", 5e-3),
                     ("refine_trans", 5e-2), ("refine_scale", 1e-3),
                     ("refine_latent", 1e-5)):
        d = float(np.max(np.abs(np.asarray(cpu[key], np.float64)
                                - np.asarray(tpu[key], np.float64))))
        rows.append(_row(f"{key}_max_abs", d, lim))

    # -- Pallas selection kernel: values + rank contract ------------------
    a, b = np.asarray(cpu["select_sdf"], np.float64), np.asarray(
        tpu["select_sdf"], np.float64)
    rows.append(_row("select_sdf_max_abs", float(np.max(np.abs(a - b))),
                     1e-3))  # measured 5.4e-5
    k = 4096
    band_a = set(np.argsort(np.abs(a))[:k].tolist())
    band_b = set(np.argsort(np.abs(b))[:k].tolist())
    rows.append(_row("select_band_overlap_top4096",
                     len(band_a & band_b) / k, 0.95, op=">="))
    return rows


def main():
    if "--compute" in sys.argv:
        out = compute()
        np.savez(os.environ.get("SDFLABEL_PARITY_DUMP", "parity.npz"), **out)
        print(f"dumped {len(out)} arrays "
              f"({np.asarray(out['backend'])})", flush=True)
        return

    out_json = "PARITY_r04.json"
    if "--out" in sys.argv:
        out_json = sys.argv[sys.argv.index("--out") + 1]

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

    rows = gate(cpu, tpu)
    print("\n| row | value | limit | pass |")
    print("|---|---|---|---|")
    for rec in rows:
        print(f"| {rec['row']} | {rec['value']:.3e} | {rec['op']} "
              f"{rec['limit']:.3e} | {'PASS' if rec['pass'] else 'FAIL'} |")

    import json

    verdict = {"backend_tpu": str(np.asarray(tpu["backend"])),
               "all_pass": all(r["pass"] for r in rows), "rows": rows}
    with open(out_json, "w") as f:
        json.dump(verdict, f, indent=1)
    print(f"\nwrote {out_json} (all_pass={verdict['all_pass']})",
          flush=True)
    if not verdict["all_pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
