"""Golden-image corpus: size/intensity sweep + perceptual-diff harness.

The device renderer is pixel-exact vs the sequential NumPy rasterizer
(`render/reference.py`), so the corpus pins exactness across the GUI's
slider ranges (`Particles.cpp:373-374`: size 0-10, intensity 0-2) and
camera distances; the perceptual metric (luma PSNR) covers quantized
modes where bit-exactness is not the contract (RGB8 frames).
"""

import numpy as np
import pytest

from multi_adapter_particles_tpu.config import RenderConfig
from multi_adapter_particles_tpu.models.state import ParticleState
from multi_adapter_particles_tpu.render import camera as cam, reference as ref
from multi_adapter_particles_tpu.render.renderer import Renderer


def _scene(seed, n=40):
    rng = np.random.default_rng(seed)
    pos = np.zeros((n, 4), dtype=np.float32)
    pos[:, :3] = rng.uniform(-350, 350, size=(n, 3)).astype(np.float32)
    pos[:, 3] = rng.uniform(0, 12, size=n).astype(np.float32)
    return pos


def luma_psnr(a, b) -> float:
    """Perceptual-diff harness: PSNR of the Rec.601 luma plane, dB."""
    w = np.asarray([0.299, 0.587, 0.114])
    ya = np.asarray(a, np.float64) @ w
    yb = np.asarray(b, np.float64) @ w
    mse = np.mean((ya - yb) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(1.0 / mse))


class TestSliderCorpus:
    @pytest.mark.parametrize(
        "size,intensity",
        [(1.0, 0.15), (2.5, 0.5), (6.0, 1.0), (10.0, 2.0), (4.0, 0.05)],
    )
    def test_exact_across_slider_ranges(self, size, intensity):
        pos = _scene(int(size * 10 + intensity * 100))
        cfg = RenderConfig(width=256, height=128)
        golden = ref.render_reference(
            pos, cfg, particle_size=size, particle_intensity=intensity
        )
        st = ParticleState.from_aos(pos, np.zeros((pos.shape[0], 3), np.float32))
        r = Renderer(cfg)
        frame = np.asarray(
            r.render(st.position, cam.Camera(), size, intensity)
        )
        assert np.abs(frame - golden).max() < 2e-3
        # sanity: the perceptual harness agrees they are the same image
        assert luma_psnr(frame, golden) > 60.0

    @pytest.mark.parametrize("dist", [400.0, 900.0, 2200.0])
    def test_exact_across_camera_distance(self, dist):
        pos = _scene(3)
        cfg = RenderConfig(width=256, height=128)
        c = cam.Camera(position=(0.0, 0.0, dist))
        golden = ref.render_reference(
            pos, cfg, particle_size=6.0, particle_intensity=0.5, camera=c
        )
        st = ParticleState.from_aos(pos, np.zeros((pos.shape[0], 3), np.float32))
        frame = np.asarray(
            Renderer(cfg).render(st.position, c, 6.0, 0.5)
        )
        assert np.abs(frame - golden).max() < 2e-3


class TestAdversarialCorpus:
    """Scenes built to break tie-handling and clipping, not coverage.

    Draw order is particle-ID order with NO depth test
    (`Render.cpp:891`, one DrawInstanced call) — so coincident sprites,
    equal-depth overlaps, and sort-key ties must all composite in id
    order for the device renderer to stay exact vs the oracle."""

    def _render_both(self, pos, cfg=None, camera=None, size=6.0,
                     intensity=0.5):
        cfg = cfg or RenderConfig(width=256, height=128)
        camera = camera or cam.Camera()
        golden = ref.render_reference(
            pos, cfg, particle_size=size, particle_intensity=intensity,
            camera=camera,
        )
        st = ParticleState.from_aos(
            pos, np.zeros((pos.shape[0], 3), np.float32)
        )
        frame = np.asarray(
            Renderer(cfg).render(st.position, camera, size, intensity)
        )
        return frame, golden

    def test_exact_with_coincident_particles(self):
        """Stacks of EXACT position duplicates: every sort key ties, and
        the over-blend is order-sensitive (each sprite has a different
        id-hash blue and accel color) — only id-stable ordering matches."""
        rng = np.random.default_rng(7)
        stacks = rng.uniform(-200, 200, size=(6, 3)).astype(np.float32)
        pos = np.zeros((48, 4), dtype=np.float32)
        pos[:, :3] = np.repeat(stacks, 8, axis=0)   # 8 sprites per point
        pos[:, 3] = rng.uniform(0, 12, size=48).astype(np.float32)
        frame, golden = self._render_both(pos)
        assert np.abs(frame - golden).max() < 2e-3
        # order sensitivity is real: reversed draw order changes the image
        rev = ref.render_reference(
            pos[::-1].copy(), RenderConfig(width=256, height=128),
            particle_size=6.0, particle_intensity=0.5,
        )
        assert np.abs(rev - golden).max() > 1e-3

    def test_exact_on_equal_depth_plane(self):
        """All sprites share one eye-space depth (identical depth keys)
        while overlapping across tile boundaries."""
        xs = np.linspace(-240, 240, 9, dtype=np.float32)
        ys = np.linspace(-120, 120, 5, dtype=np.float32)
        gx, gy = np.meshgrid(xs, ys)
        n = gx.size
        pos = np.zeros((n, 4), dtype=np.float32)
        pos[:, 0] = gx.ravel()
        pos[:, 1] = gy.ravel()
        pos[:, 2] = 0.0                              # one depth plane
        pos[:, 3] = np.arange(n, dtype=np.float32) % 13
        frame, golden = self._render_both(pos, size=9.0, intensity=0.8)
        assert np.abs(frame - golden).max() < 2e-3

    def test_exact_with_behind_camera_and_giant_sprites(self):
        """Mixed clip stress: sprites behind the eye (must vanish), a
        near-eye sprite projecting far larger than a tile (straddles
        many tiles and the frame edge), and normal sprites — one scene."""
        pos = np.zeros((12, 4), dtype=np.float32)
        pos[:, 3] = np.arange(12, dtype=np.float32)
        pos[0, :3] = (0.0, 0.0, 2000.0)      # behind the eye
        pos[1, :3] = (300.0, 100.0, 1700.0)  # behind, off-axis
        pos[2, :3] = (0.0, 0.0, 1400.0)      # 100 units from eye: giant
        pos[3, :3] = (-350.0, -160.0, 1350.0)  # giant, partly off-frame
        rng = np.random.default_rng(21)
        pos[4:, :3] = rng.uniform(-300, 300, size=(8, 3)).astype(np.float32)
        frame, golden = self._render_both(pos, size=8.0, intensity=0.4)
        assert np.abs(frame - golden).max() < 2e-3
        # the behind-eye sprites really were culled somewhere: a frame
        # rendered with ONLY them is black
        behind = ref.render_reference(
            pos[:2], RenderConfig(width=256, height=128),
            particle_size=8.0, particle_intensity=0.4,
        )
        assert behind.max() == 0.0

    @pytest.mark.parametrize(
        "yaw_off,pitch",
        [(0.7, 0.0), (0.0, 0.9), (2.4, -0.8), (3.14159, 0.0)],
    )
    def test_exact_under_extreme_poses(self, yaw_off, pitch):
        """Fly-cam poses far off the demo axis, incl. pitch near the
        gimbal clamp and a yaw that faces AWAY from the cloud (frame may
        be black — it must be black in both renderers)."""
        import math

        pos = _scene(int(yaw_off * 10 + pitch * 100) & 0x7fffffff, n=60)
        c = cam.Camera(position=(200.0, -300.0, 1100.0))
        c.yaw = math.pi + yaw_off
        c.pitch = pitch
        frame, golden = self._render_both(pos, camera=c, size=7.0,
                                          intensity=0.6)
        assert np.abs(frame - golden).max() < 2e-3


class TestQuantizedPerceptual:
    def test_rgb8_frame_is_perceptually_lossless(self):
        """RGB8 quantization (frame_uint8) vs the fp32 frame: > 48 dB
        luma PSNR (8-bit rounding floor is ~52-58 dB on natural images;
        pixel-identity is NOT the contract here, perceptual quality is)."""
        pos = _scene(9, n=80)
        st = ParticleState.from_aos(pos, np.zeros((pos.shape[0], 3), np.float32))
        f32 = np.asarray(
            Renderer(RenderConfig(width=256, height=128)).render(
                st.position, cam.Camera(), 6.0, 0.8
            )
        )
        f8 = np.asarray(
            Renderer(RenderConfig(width=256, height=128, frame_uint8=True))
            .render(st.position, cam.Camera(), 6.0, 0.8)
        )
        assert luma_psnr(f8.astype(np.float64) / 255.0, f32) > 48.0
