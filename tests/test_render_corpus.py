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
