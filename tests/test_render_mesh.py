"""Mesh-sharded renderer: the render role scaled over the device mesh.

The reference's multi-adapter split copies ALL positions to the single
render adapter every frame (`Render.cpp:814` — 64 MiB @4M); `render_mesh`
keeps shards where they live, rasterizes per device, and folds the
(color, transmittance) pairs in id order. Equality contracts:

- equal to `_render_chunked` at a matching partition up to ~1 ULP (same
  per-chunk math and left-fold association; only XLA's fusion/FMA
  choices differ between the two compiled programs);
- fp32-close to the single-pass frame (reassociation of the blend only);
- truncation/span metrics aggregate across shards.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from multi_adapter_particles_tpu.config import RenderConfig
from multi_adapter_particles_tpu.models.state import ParticleState
from multi_adapter_particles_tpu.parallel import make_mesh, shard_state
from multi_adapter_particles_tpu.parallel.mesh import make_multislice_mesh
from multi_adapter_particles_tpu.render import camera as cam
from multi_adapter_particles_tpu.render.renderer import Renderer

N = 2048  # 8 shards x 256 (2 lane rows each)


def _state(seed=5, n=N, spread=350.0):
    rng = np.random.default_rng(seed)
    pos = np.zeros((n, 4), dtype=np.float32)
    pos[:, :3] = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    pos[:, 3] = rng.uniform(0, 12, size=n).astype(np.float32)
    return ParticleState.from_aos(pos, np.zeros((n, 3), np.float32))


class TestRenderMesh:
    def test_equals_chunked_at_matching_partition(self, eight_devices):
        mesh = make_mesh(eight_devices)
        st = _state()
        sh = shard_state(st, mesh)
        cfg = RenderConfig(width=256, height=128)

        r_mesh = Renderer(cfg)
        out_m = r_mesh.render_mesh(sh.position, cam.Camera(), 4.0, 0.4, mesh)

        r_chunk = Renderer(cfg)
        r_chunk.chunk_threshold = N - 1    # force the chunked path
        r_chunk.chunk_size = N // 8        # same partition as the mesh
        out_c = r_chunk.render_arrays(st.position, cam.Camera(), 4.0, 0.4)

        np.testing.assert_allclose(
            np.asarray(out_m.frame), np.asarray(out_c.frame), atol=1e-7
        )
        assert int(out_m.truncated) == int(out_c.truncated)
        assert int(out_m.span_y) == int(out_c.span_y)
        assert int(out_m.span_x) == int(out_c.span_x)

    def test_close_to_single_pass_frame(self, eight_devices):
        mesh = make_mesh(eight_devices[:4])
        st = _state(seed=9)
        sh = shard_state(st, mesh)
        cfg = RenderConfig(width=256, height=128)
        out_m = Renderer(cfg).render_mesh(
            sh.position, cam.Camera(), 5.0, 0.6, mesh
        )
        single = Renderer(cfg).render_arrays(
            st.position, cam.Camera(), 5.0, 0.6
        )
        np.testing.assert_allclose(
            np.asarray(out_m.frame), np.asarray(single.frame), atol=2e-3
        )

    def test_multislice_mesh(self, eight_devices):
        mesh = make_multislice_mesh(2, eight_devices)
        st = _state(seed=3)
        sh = shard_state(st, mesh)
        cfg = RenderConfig(width=128, height=64)
        out_m = Renderer(cfg).render_mesh(
            sh.position, cam.Camera(), 4.0, 0.5, mesh
        )
        single = Renderer(cfg).render_arrays(
            st.position, cam.Camera(), 4.0, 0.5
        )
        np.testing.assert_allclose(
            np.asarray(out_m.frame), np.asarray(single.frame), atol=2e-3
        )

    def test_num_draw_prefix_crosses_shards(self, eight_devices):
        """num_draw is a GLOBAL id prefix: a count landing mid-shard must
        draw all of shards 0..k-1, part of shard k, none after."""
        mesh = make_mesh(eight_devices)
        st = _state(seed=11)
        sh = shard_state(st, mesh)
        cfg = RenderConfig(width=256, height=128)
        nd = N // 8 * 3 + 64               # 3 full shards + a partial one
        out_m = Renderer(cfg).render_mesh(
            sh.position, cam.Camera(), 4.0, 0.4, mesh, num_draw=nd
        )
        single = Renderer(cfg).render_arrays(
            st.position, cam.Camera(), 4.0, 0.4, num_draw=nd
        )
        np.testing.assert_allclose(
            np.asarray(out_m.frame), np.asarray(single.frame), atol=2e-3
        )
        # and it is genuinely a prefix: full-draw differs
        full = Renderer(cfg).render_arrays(st.position, cam.Camera(), 4.0, 0.4)
        assert np.abs(np.asarray(full.frame)
                      - np.asarray(single.frame)).max() > 1e-3

    def test_span_metrics_aggregate_across_shards(self, eight_devices):
        """A giant sprite living in a LATE shard must surface in the
        folded span/truncated scalars (the auto-raise-dup feed)."""
        mesh = make_mesh(eight_devices)
        st = _state(seed=13)
        pos = np.asarray(st.position).copy()
        col = N - 10                       # lives in the last shard
        pos[:3, col] = (0.0, 0.0, 1400.0)  # 100 units from the eye: giant
        sh = ParticleState(
            jnp.asarray(pos), jnp.zeros_like(jnp.asarray(pos))
        )
        sh = shard_state(sh, mesh)
        cfg = RenderConfig(width=256, height=128)
        r = Renderer(cfg)
        out = r.render_mesh(sh.position, cam.Camera(), 8.0, 0.4, mesh)
        assert int(out.truncated) > 0
        assert int(out.span_y) > r.dup_y or int(out.span_x) > r.dup_x
        # raise_dup_for budgets against the SHARD sort size, then a
        # re-render is lossless
        assert r.raise_dup_for(out)
        out2 = r.render_mesh(sh.position, cam.Camera(), 8.0, 0.4, mesh)
        assert int(out2.truncated) == 0

    def test_app_pipeline_matches_gather_path(self, eight_devices):
        """Full orchestrator: -meshdevices 8 -shardrender draws the same
        frames as the mesh + gather-to-render-device pipeline."""
        from multi_adapter_particles_tpu.config import AppConfig, SimConfig
        from multi_adapter_particles_tpu.runtime.orchestrator import (
            ParticlesApp,
        )

        def run(shard_render):
            app = ParticlesApp(
                AppConfig(num_particles=N, gui=False, vsync=False),
                SimConfig(num_particles=N),
                RenderConfig(width=256, height=128),
                seed=4,
                mesh_devices=8,
                shard_render=shard_render,
            )
            banner = app.metrics.gauges["mode_banner"]
            for _ in range(3):
                app.draw()
            app.compute.wait_for_gpu()
            app.render.present()
            frame = np.asarray(app.render.last_frame)
            tb = app.metrics.counters.get("transfer_bytes", 0.0)
            app.shutdown()
            return frame, banner, tb

        f_sh, b_sh, tb_sh = run(True)
        f_ga, b_ga, tb_ga = run(False)
        np.testing.assert_allclose(f_sh, f_ga, atol=2e-3)
        assert "sharded render" in b_sh and "sharded render" not in b_ga
        # traffic accounting: image pairs (O(pixels x devices)) vs the
        # position copy (O(N)); both are recorded, neither is free
        assert tb_sh == 3 * 8 * 256 * 128 * 16
        assert tb_ga == 3 * N * 16

    def test_shard_render_survives_elastic_rescale(self, eight_devices):
        """Live mesh rescale (8 -> 2 -> 1 devices) with -shardrender: the
        render path follows the mesh (sharded at 8 and 2, gather at 1)
        and the final frame matches a never-sharded run bitwise-stable
        trajectory + fp32-close render."""
        from multi_adapter_particles_tpu.config import AppConfig, SimConfig
        from multi_adapter_particles_tpu.runtime.orchestrator import (
            ParticlesApp,
        )

        def make(mesh_devices, shard_render):
            return ParticlesApp(
                AppConfig(num_particles=N, gui=False, vsync=False),
                SimConfig(num_particles=N),
                RenderConfig(width=128, height=64),
                seed=6,
                mesh_devices=mesh_devices,
                shard_render=shard_render,
            )

        app = make(8, True)
        assert "sharded render" in app.metrics.gauges["mode_banner"]
        for _ in range(2):
            app.draw()
        app.set_mesh_devices(2)
        assert app.render.mesh is not None
        for _ in range(2):
            app.draw()
        app.set_mesh_devices(1)
        assert app.render.mesh is None  # back to the gather/zero-copy path
        for _ in range(2):
            app.draw()
        app.compute.wait_for_gpu()
        app.render.present()
        frame = np.asarray(app.render.last_frame)
        app.shutdown()

        ref = make(0, False)
        for _ in range(6):
            ref.draw()
        ref.compute.wait_for_gpu()
        ref.render.present()
        ref_frame = np.asarray(ref.render.last_frame)
        ref.shutdown()
        np.testing.assert_allclose(frame, ref_frame, atol=2e-3)

    def test_cli_flag_end_to_end(self, tmp_path, eight_devices):
        import json

        from multi_adapter_particles_tpu.app import main

        metrics = str(tmp_path / "m.json")
        rc = main([
            "-numparticles", "1024", "-steps", "2", "-novsync", "-nogui",
            "-width", "128", "-height", "64", "-meshdevices", "8",
            "-shardrender", "-metrics", metrics,
        ])
        assert rc == 0
        m = json.loads(open(metrics).read())
        assert "sharded render" in m["gauges"]["mode_banner"]

    def test_rejects_unaligned_counts(self, eight_devices):
        mesh = make_mesh(eight_devices)
        st = _state(n=1024 + 128)          # 1152: not divisible by 8x128
        sh = st  # no need to place it; the check is host-side
        with pytest.raises(ValueError, match="divisible"):
            Renderer(RenderConfig(width=128, height=64)).render_mesh(
                sh.position, cam.Camera(), 4.0, 0.4, mesh
            )
