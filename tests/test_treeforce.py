"""Tree-structured (Morton-block dual-tree) P³M near field — the mode
that stays exact on ANY density contrast, including the demo's cluster
cores where the static-K slot sweep overflows (VERDICT r2 #2). Pinned
against `integrator.all_pairs_accel` (the reference's exact
bodyBodyInteraction lineage, `nBodyGravityCS.hlsl:44-57`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from multi_adapter_particles_tpu.models import integrator, oracle
from multi_adapter_particles_tpu.ops import p3m
from multi_adapter_particles_tpu.ops.treeforce import near_field_tree

MASS = 70000.0
EPS2 = 25.0


def aos(pos3):
    p = np.zeros((4, pos3.shape[0]), np.float32)
    p[:3] = pos3.T
    return jnp.asarray(p)


def exact(pos3):
    return np.asarray(
        integrator.all_pairs_accel(aos(pos3), mass=MASS,
                                   softening_squared=EPS2)
    )


def rms_vs_exact(acc, pos3):
    a_ex = exact(pos3)
    scale = np.abs(a_ex).max()
    return float(np.sqrt(np.mean((np.asarray(acc) - a_ex) ** 2)) / scale)


@pytest.mark.slow
class TestNearFieldTree:
    def test_matches_slot_sweep_on_uniform_scene(self):
        """Where the slot sweep has zero overflow its pair set is a
        SUBSET of the tree's (bbox adjacency covers the 27-neighborhood
        and may add farther, ~1e-4-factor pairs) — near fields agree to
        well under the model's error budget."""
        rng = np.random.default_rng(3)
        pos3 = rng.normal(0, 300, (512, 3)).astype(np.float32)
        pos = aos(pos3)
        box, r_c = 4096.0, 6.75 * 64.0
        gn = int(box // r_c)
        a_slots, ov = p3m.near_field_correction(
            pos, box, MASS, EPS2, r_c, gn, capacity=128
        )
        a_tree, dropped = near_field_tree(
            pos, box, MASS, EPS2, r_c, gn, block=64
        )
        assert int(ov) == 0 and int(dropped) == 0
        scale = np.abs(np.asarray(a_slots)).max()
        diff = np.abs(np.asarray(a_tree) - np.asarray(a_slots)).max()
        assert diff < 2e-3 * scale

    @pytest.mark.parametrize("n", [500, 2048])
    def test_demo_scene_full_p3m_under_one_percent(self, n):
        """THE round-2 gap: the two-cluster demo init (a shell that packs
        thousands of particles per near cell at scale) through full P³M
        with the tree near field lands <1% RMS of the exact all-pairs
        force — the slot sweep cannot cover this scene at any practical
        capacity."""
        pos, _vel = oracle.initialize_particles(n, seed=42)
        pos3 = pos[:, :3].astype(np.float32)
        acc, overflow = p3m.p3m_accel_with_overflow(
            aos(pos3), grid=64, box=2048.0, g_const=MASS,
            softening_squared=EPS2, near_mode="tree",
        )
        assert int(overflow) == 0
        rms = rms_vs_exact(acc, pos3)
        assert rms < 0.01, f"tree-P3M rms {rms:.4f} @ n={n}"

    def test_demo_scene_slot_mode_is_worse(self):
        """Contrast pin: the same scene through the slot sweep (default
        capacity) overflows and degrades — documents WHY tree is the
        demo-scene mode."""
        n = 2048
        pos, _ = oracle.initialize_particles(n, seed=42)
        pos3 = pos[:, :3].astype(np.float32)
        acc_s, ov = p3m.p3m_accel_with_overflow(
            aos(pos3), grid=64, box=2048.0, g_const=MASS,
            softening_squared=EPS2, near_mode="slots", capacity=64,
        )
        assert int(ov) > 0
        assert rms_vs_exact(acc_s, pos3) > 0.01

    def test_padding_and_block_misalignment(self):
        """n not a multiple of the block size: padded tail must be force-
        inert and the un-sort exact."""
        rng = np.random.default_rng(7)
        n = 333
        pos3 = rng.normal(0, 150, (n, 3)).astype(np.float32)
        pos = aos(pos3)
        box, r_c = 2048.0, 432.0
        gn = int(box // r_c)
        a64, d64 = near_field_tree(pos, box, MASS, EPS2, r_c, gn, block=64)
        a256, d256 = near_field_tree(pos, box, MASS, EPS2, r_c, gn,
                                     block=256)
        assert int(d64) == 0 and int(d256) == 0
        np.testing.assert_allclose(
            np.asarray(a64), np.asarray(a256), rtol=2e-4, atol=2e-2
        )
        assert np.isfinite(np.asarray(a64)).all()

    def test_permutation_equivariance(self):
        """Shuffling the particles permutes the forces identically (the
        Morton sort + pid un-sort round-trips)."""
        rng = np.random.default_rng(9)
        n = 256
        pos3 = rng.normal(0, 150, (n, 3)).astype(np.float32)
        perm = rng.permutation(n)
        box, r_c = 2048.0, 432.0
        gn = int(box // r_c)
        a, _ = near_field_tree(aos(pos3), box, MASS, EPS2, r_c, gn,
                               block=64)
        ap, _ = near_field_tree(aos(pos3[perm]), box, MASS, EPS2, r_c, gn,
                                block=64)
        np.testing.assert_allclose(
            np.asarray(a)[:, perm], np.asarray(ap), rtol=2e-4, atol=1e-3
        )

    def test_pair_budget_overflow_is_counted(self):
        rng = np.random.default_rng(11)
        pos3 = rng.normal(0, 30, (512, 3)).astype(np.float32)  # one blob
        box, r_c = 2048.0, 432.0
        gn = int(box // r_c)
        _, dropped = near_field_tree(
            aos(pos3), box, MASS, EPS2, r_c, gn, block=64, pair_budget=8
        )
        assert int(dropped) > 0

    def test_out_of_box_gets_no_near_force(self):
        """Same contract as the slot sweep: out-of-box particles receive
        zero near correction."""
        pos3 = np.array(
            [[3000.0, 0, 0], [3010.0, 0, 0], [10.0, 0, 0], [20.0, 0, 0]],
            np.float32,
        )
        box, r_c = 2048.0, 432.0
        gn = int(box // r_c)
        a, _ = near_field_tree(aos(pos3), box, MASS, EPS2, r_c, gn,
                               block=64)
        a = np.asarray(a)
        # outside the box: parked pairs leave only a vanishing underflow
        # residue (~1e-21 force units vs O(1) real forces)
        assert np.all(np.abs(a[:, :2]) < 1e-12)
        assert np.any(np.abs(a[:, 2:]) > 1e-3)  # the in-box pair interacts


class TestTreeViaSimConfig:
    def test_step_with_tree_mode_runs(self):
        from multi_adapter_particles_tpu.config import SimConfig
        from multi_adapter_particles_tpu.models import init as pinit

        n = 512
        cfg = SimConfig(
            num_particles=n, force_model="p3m", pm_grid_size=32,
            pm_box=4096.0, p3m_near_mode="tree",
        )
        step = integrator.make_step(cfg, donate=False)
        state = pinit.initialize_particles_device(n, seed=1)
        out = step(state)
        assert np.isfinite(np.asarray(out.position)).all()

    def test_bad_mode_rejected(self):
        from multi_adapter_particles_tpu.config import SimConfig

        with pytest.raises(ValueError, match="p3m_near_mode"):
            SimConfig(num_particles=64, p3m_near_mode="typo")


class TestChebFactor:
    def test_matches_f64_truth_everywhere(self):
        """short_factor_cheb vs the f64 erf ground truth: <=1e-5 of the
        exact force at EVERY separation inside the cutoff, exactly zero
        beyond it (inside the 1.4e-4 truncation budget), zero at parked
        slots. The f32 erf form itself loses ~45% below r~0.01 to
        cancellation — the fit is strictly more accurate."""
        import math

        from multi_adapter_particles_tpu.ops.treeforce import (
            _TC, short_factor_cheb,
        )

        erf = np.vectorize(math.erf)
        eps2 = 25.0
        for sigma in (24.0, 96.0):
            r = np.linspace(1e-3, _TC * sigma * 0.9999, 20001).astype(
                np.float32
            )
            r64 = r.astype(np.float64)
            t = r64 / sigma
            g = (
                erf(t / math.sqrt(2))
                - math.sqrt(2 / math.pi) * t * np.exp(-t * t / 2)
            ) / r64 ** 3
            s_true = (r64 ** 2 + eps2) ** -1.5 - g
            a = np.asarray(
                short_factor_cheb(jnp.asarray(r * r), eps2,
                                  jnp.float32(sigma))
            )
            rel = np.abs(a - s_true) / (r64 ** 2 + eps2) ** -1.5
            assert rel.max() < 1e-5, rel.max()
            beyond = short_factor_cheb(
                jnp.asarray([(1.01 * _TC * sigma) ** 2, 3e18],
                            dtype=jnp.float32),
                eps2, jnp.float32(sigma),
            )
            assert np.all(np.asarray(beyond) == 0.0)


@pytest.mark.slow
class TestAutoGrid:
    """auto_grid must reproduce the MEASURED grid optima on the demo
    init (on-chip sweeps, ROADMAP): G=128 at 262K, G=192 at 1M. These
    pin the calibrated cost model against ground truth — if the model
    constants drift, these fail before a user pays a 2x step time."""

    @pytest.mark.parametrize("n,expected", [(262_144, 128), (1_048_576, 192)])
    def test_matches_measured_optimum(self, n, expected):
        from multi_adapter_particles_tpu.models import init as pinit
        from multi_adapter_particles_tpu.ops.treeforce import auto_grid

        pos = pinit.initialize_particles_host(n, seed=42).position
        assert auto_grid(pos, 2048.0, 6.75) == expected

    def test_uniform_scene_prefers_smaller_grid_than_clusters(self):
        """A uniform scene has far fewer near pairs per cell, so the
        far-field term dominates earlier -> smaller optimum than the
        same-N two-cluster demo init."""
        from multi_adapter_particles_tpu.models import init as pinit
        from multi_adapter_particles_tpu.ops.treeforce import auto_grid

        n = 262_144
        rng = np.random.default_rng(0)
        uniform = np.full((4, n), 1e9, np.float32)
        uniform[:3] = rng.uniform(-900, 900, (3, n)).astype(np.float32)
        demo = pinit.initialize_particles_host(n, seed=42).position
        g_uni = auto_grid(uniform, 2048.0, 6.75)
        g_demo = auto_grid(demo, 2048.0, 6.75)
        assert g_uni <= g_demo

    def test_hbm_feasibility_excludes_oversized_grids(self):
        """G=384's long-range FFT working set peaks at 19.21 GiB of HLO
        temps on the 16 GiB chip (measured AOT compile failure @4M with
        the lane-packed rows, 2026-08-19 08:19 sweep — the doubled-grid
        rfft intermediates, ~10 live (2G)^3 buffers). The feasibility
        roof must exclude 384/512 from every candidate set so auto_grid
        never hands the device an uncompilable mesh."""
        from multi_adapter_particles_tpu.ops.treeforce import (
            AUTO_GRID_LADDER,
            auto_grid,
            feasible_grid,
        )

        assert [g for g in AUTO_GRID_LADDER if not feasible_grid(g)] == \
            [384, 512]
        n = 65_536
        rng = np.random.default_rng(1)
        pos = np.full((4, n), 1e9, np.float32)
        pos[:3] = rng.uniform(-900, 900, (3, n)).astype(np.float32)
        # explicit candidate list including infeasible grids: filtered
        assert auto_grid(pos, 2048.0, 6.75, candidates=(384, 512, 128)) \
            == 128
        with pytest.raises(ValueError, match="HBM solve budget"):
            auto_grid(pos, 2048.0, 6.75, candidates=(384, 512))

    def test_budget_consumes_shared_probe(self):
        """host_pair_budget is the probe count x headroom + 1."""
        from multi_adapter_particles_tpu.ops.treeforce import (
            host_block_pairs,
            host_pair_budget,
        )

        rng = np.random.default_rng(3)
        pos = np.zeros((4, 4096), np.float32)
        pos[:3] = rng.normal(0, 80, (3, 4096)).astype(np.float32)
        count, block = host_block_pairs(pos, 2048.0, 216.0, 9)
        assert count > 0 and block >= 128
        assert host_pair_budget(pos, 2048.0, 216.0, 9) == int(count * 1.25) + 1


@pytest.mark.slow
class TestPallasSweep:
    def test_kernel_matches_xla_sweep(self, monkeypatch):
        """The VMEM sweep kernel (interpret mode on CPU) == the XLA
        chunked sweep, on a clustered scene with a real pair list."""
        from multi_adapter_particles_tpu.ops import dispatch

        rng = np.random.default_rng(5)
        n = 1024
        pos3 = np.concatenate(
            [
                rng.normal(0, 60, (n // 2, 3)),
                rng.normal(300, 60, (n // 2, 3)),
            ]
        ).astype(np.float32)
        pos = aos(pos3)
        box, r_c = 2048.0, 216.0
        gn = int(box // r_c)
        a_xla, d_xla = near_field_tree(pos, box, MASS, EPS2, r_c, gn,
                                       block=128)
        monkeypatch.setattr(dispatch, "pallas_supported", lambda: True)
        a_pl, d_pl = near_field_tree(pos, box, MASS, EPS2, r_c, gn,
                                     block=128)
        assert int(d_xla) == int(d_pl) == 0
        np.testing.assert_allclose(
            np.asarray(a_pl), np.asarray(a_xla), rtol=1e-5, atol=1e-4
        )
        assert np.abs(np.asarray(a_pl)).max() > 1e-3

    def test_sliced_pair_list_matches_single_invocation(self, monkeypatch):
        """Pair lists past the SMEM roof run as multiple kernel
        invocations over slices of the i-major list; a tiny forced cap
        must reproduce the single-invocation result up to fp32
        re-association of a straddling target's partial sums (slice
        boundaries land mid-target-block on purpose)."""
        from multi_adapter_particles_tpu.ops import dispatch

        rng = np.random.default_rng(11)
        n = 1024
        pos3 = np.concatenate(
            [
                rng.normal(0, 60, (n // 2, 3)),
                rng.normal(300, 60, (n // 2, 3)),
            ]
        ).astype(np.float32)
        pos = aos(pos3)
        box, r_c = 2048.0, 216.0
        gn = int(box // r_c)
        monkeypatch.setattr(dispatch, "pallas_supported", lambda: True)
        a_one, d_one = near_field_tree(pos, box, MASS, EPS2, r_c, gn,
                                       block=128)
        for cap in (10, 2):  # odd-ish slice counts, boundary mid-block
            a_sl, d_sl = near_field_tree(
                pos, box, MASS, EPS2, r_c, gn, block=128,
                sweep_slice_cap=cap,
            )
            assert int(d_sl) == int(d_one) == 0
            np.testing.assert_allclose(
                np.asarray(a_sl), np.asarray(a_one), rtol=1e-5, atol=1e-4
            )

    def test_subblock_expansion_matches_direct(self, monkeypatch):
        """Blocks wider than the sweep cap are split into sub-block pairs
        (exact by linearity): forcing a tiny cap must reproduce the direct
        sweep up to fp32 re-association, with and without slicing."""
        from multi_adapter_particles_tpu.ops import dispatch, treeforce

        rng = np.random.default_rng(13)
        n = 1024
        pos3 = np.concatenate(
            [
                rng.normal(0, 60, (n // 2, 3)),
                rng.normal(300, 60, (n // 2, 3)),
            ]
        ).astype(np.float32)
        pos = aos(pos3)
        box, r_c = 2048.0, 216.0
        gn = int(box // r_c)
        monkeypatch.setattr(dispatch, "pallas_supported", lambda: True)
        a_dir, d_dir = near_field_tree(pos, box, MASS, EPS2, r_c, gn,
                                       block=128)
        monkeypatch.setattr(treeforce, "_SWEEP_MAX_BLOCK", 32)
        a_sub, d_sub = near_field_tree(pos, box, MASS, EPS2, r_c, gn,
                                       block=128)
        assert int(d_dir) == int(d_sub) == 0
        np.testing.assert_allclose(
            np.asarray(a_sub), np.asarray(a_dir), rtol=2e-4, atol=1e-3
        )
        # expansion composed with SMEM slicing (boundaries mid-sub-list)
        a_sl, d_sl = near_field_tree(
            pos, box, MASS, EPS2, r_c, gn, block=128, sweep_slice_cap=10,
        )
        assert int(d_sl) == 0
        np.testing.assert_allclose(
            np.asarray(a_sl), np.asarray(a_dir), rtol=2e-4, atol=1e-3
        )

    def test_sub_pair_budget_truncates_and_counts(self, monkeypatch):
        """A generous sub-pair budget sheds only pruned sentinel entries
        (identical forces, dropped stays 0); a starved one must count the
        live shortfall in dropped_pairs rather than lose it silently."""
        from multi_adapter_particles_tpu.ops import dispatch, treeforce

        rng = np.random.default_rng(17)
        n = 1024
        pos3 = np.concatenate(
            [
                rng.normal(0, 60, (n // 2, 3)),
                rng.normal(300, 60, (n // 2, 3)),
            ]
        ).astype(np.float32)
        pos = aos(pos3)
        box, r_c = 2048.0, 216.0
        gn = int(box // r_c)
        monkeypatch.setattr(dispatch, "pallas_supported", lambda: True)
        monkeypatch.setattr(treeforce, "_SWEEP_MAX_BLOCK", 32)
        a_full, d_full = near_field_tree(pos, box, MASS, EPS2, r_c, gn,
                                         block=128)
        # host probe == device survivor count (same rule): generous cap
        sub = treeforce.host_block_pairs(pos, box, r_c, gn, block=32)[0]
        a_cap, d_cap = near_field_tree(
            pos, box, MASS, EPS2, r_c, gn, block=128,
            sub_pair_budget=sub + 2,
        )
        assert int(d_full) == int(d_cap) == 0
        np.testing.assert_array_equal(np.asarray(a_cap), np.asarray(a_full))
        # starved cap: shortfall counted
        a_st, d_st = near_field_tree(
            pos, box, MASS, EPS2, r_c, gn, block=128,
            sub_pair_budget=max(2, sub // 2),
        )
        assert int(d_st) > 0
        assert np.isfinite(np.asarray(a_st)).all()

    def test_sub_budget_shortfall_is_global_under_ownership(self, monkeypatch):
        """dropped_pairs must be identical on every device (the mesh
        contract in the near_field_tree docstring): with a starved
        sub-pair budget the shortfall is recounted from the
        un-owner-masked survivor list, so complementary owner halves
        report the same global number (round-4 review catch: the
        owner-masked count diverged per device)."""
        from multi_adapter_particles_tpu.ops import dispatch, treeforce

        rng = np.random.default_rng(17)
        n = 1024
        pos3 = np.concatenate(
            [
                rng.normal(0, 60, (n // 2, 3)),
                rng.normal(300, 60, (n // 2, 3)),
            ]
        ).astype(np.float32)
        pos = aos(pos3)
        box, r_c = 2048.0, 216.0
        gn = int(box // r_c)
        monkeypatch.setattr(dispatch, "pallas_supported", lambda: True)
        monkeypatch.setattr(treeforce, "_SWEEP_MAX_BLOCK", 32)
        sub = treeforce.host_block_pairs(pos, box, r_c, gn, block=32)[0]
        starve = max(2, sub // 2)
        _, d_all = near_field_tree(
            pos, box, MASS, EPS2, r_c, gn, block=128,
            sub_pair_budget=starve,
        )
        dropped = []
        for parity in (0, 1):
            _, d_p = near_field_tree(
                pos, box, MASS, EPS2, r_c, gn, block=128,
                sub_pair_budget=starve,
                block_owner_fn=lambda ids, p=parity: (ids % 2) == p,
            )
            dropped.append(int(d_p))
        assert dropped[0] == dropped[1] == int(d_all) > 0

    def test_host_sub_pair_budget_gates_on_block_width(self):
        from multi_adapter_particles_tpu.ops.treeforce import (
            host_sub_pair_budget,
        )

        rng = np.random.default_rng(19)
        pos = np.zeros((4, 4096), np.float32)
        pos[:3] = rng.normal(0, 80, (3, 4096)).astype(np.float32)
        # small N: adaptive block is already sweep-width -> None
        assert host_sub_pair_budget(pos, 2048.0, 216.0, 9) is None

    def test_host_sub_pair_budget_counts_at_sweep_granularity(
        self, monkeypatch
    ):
        from multi_adapter_particles_tpu.ops import treeforce

        rng = np.random.default_rng(23)
        pos = np.zeros((4, 8192), np.float32)
        pos[:3] = rng.normal(0, 120, (3, 8192)).astype(np.float32)
        # force the wide-block gate without a multi-million-N scene
        monkeypatch.setattr(treeforce, "default_block", lambda n: 1024)
        monkeypatch.setattr(treeforce, "_SWEEP_MAX_BLOCK", 256)
        sub = treeforce.host_sub_pair_budget(pos, 2048.0, 216.0, 9)
        count, _ = treeforce.host_block_pairs(
            pos, 2048.0, 216.0, 9, block=256
        )
        assert sub == int(count * 1.25) + 2

    @pytest.mark.parametrize("seed", [3, 7, 41])
    def test_host_probe_caps_device_survivors_fuzz(self, seed, monkeypatch):
        """Safety property across random clustered scenes: capping the
        sweep by the host probe must never drop live pairs (the probe
        upper-bounds the device's post-prune survivor count)."""
        from multi_adapter_particles_tpu.ops import dispatch, treeforce

        rng = np.random.default_rng(seed)
        n = 1024
        centers = rng.uniform(-400, 400, (3, 3))
        parts = [
            rng.normal(c, rng.uniform(20, 120), (n // 3 + 1, 3))
            for c in centers
        ]
        pos3 = np.concatenate(parts)[:n].astype(np.float32)
        pos = aos(pos3)
        box, r_c = 2048.0, 216.0
        gn = int(box // r_c)
        monkeypatch.setattr(dispatch, "pallas_supported", lambda: True)
        monkeypatch.setattr(treeforce, "_SWEEP_MAX_BLOCK", 32)
        monkeypatch.setattr(treeforce, "default_block", lambda _n: 128)
        cap = treeforce.host_sub_pair_budget(pos, box, r_c, gn)
        assert cap is not None
        a, dropped = near_field_tree(
            pos, box, MASS, EPS2, r_c, gn, block=128, sub_pair_budget=cap,
        )
        assert int(dropped) == 0
        assert np.isfinite(np.asarray(a)).all()


class TestPotentialChannel:
    """`with_potential`: the diagnostics gauge's short-range pair
    potential channel (VERDICT r3 #3 — usable `-diagnostics` at 4M)."""

    def test_short_potential_poly_matches_f64_truth(self):
        """short_potential_cheb vs the f64 erf formula
        u_short = -1/sqrt(r²+eps²) + erf(r/(√2σ))/r, everywhere inside
        the cutoff; exactly 0 beyond it."""
        import math

        from multi_adapter_particles_tpu.ops.treeforce import (
            _TC, short_potential_cheb,
        )

        sigma, eps2 = 48.0, 25.0
        r = np.concatenate([
            np.linspace(1e-3, _TC * sigma, 4001),
            np.linspace(_TC * sigma * 1.0001, 3 * _TC * sigma, 64),
        ])
        got = np.asarray(
            short_potential_cheb(
                jnp.asarray((r * r).astype(np.float32)), eps2, sigma
            )
        )
        erf_v = np.vectorize(math.erf)
        truth = -1.0 / np.sqrt(r**2 + eps2) + erf_v(
            r / (math.sqrt(2.0) * sigma)
        ) / r
        inside = r <= _TC * sigma
        # fit error budget: ~5e-6 absolute on E(v), scaled by 1/sigma
        assert np.abs(got[inside] - truth[inside]).max() < 2e-5 / sigma * 48
        assert (got[~inside] == 0.0).all()

    def test_self_constant_cancels_bitwise(self):
        """short_potential_self evaluates the SAME f32 Horner at v=0, so
        subtracting it from a particle's self-pair leaves exactly 0."""
        from multi_adapter_particles_tpu.ops.treeforce import (
            short_potential_cheb, short_potential_self,
        )

        sigma, eps2 = 108.0, 25.0
        at0 = float(
            short_potential_cheb(jnp.zeros((1,), jnp.float32), eps2, sigma)[0]
        )
        assert at0 == short_potential_self(eps2, sigma)

    def _clustered(self, n=768, seed=11):
        rng = np.random.default_rng(seed)
        pos3 = np.concatenate([
            rng.normal(0, 90, (n // 2, 3)),
            rng.normal(250, 50, (n - n // 2, 3)),
        ]).astype(np.float32)
        return pos3

    def test_near_potential_matches_direct_pair_sum(self):
        """Tree-swept per-particle potential == the direct all-pairs sum
        of the same u_short (it is 0 beyond the cutoff, so the tree's
        pair list losslessly covers the support), self-term removed."""
        from multi_adapter_particles_tpu.ops.treeforce import (
            short_potential_cheb,
        )

        pos3 = self._clustered()
        n = pos3.shape[0]
        box, r_c = 2048.0, 216.0
        gn = int(box // r_c)
        sigma = r_c / 4.5
        acc, u, dropped = near_field_tree(
            aos(pos3), box, MASS, EPS2, r_c, gn, with_potential=True
        )
        assert int(dropped) == 0
        d2 = ((pos3[None, :, :] - pos3[:, None, :]) ** 2).sum(-1)
        up = np.array(
            short_potential_cheb(jnp.asarray(d2), EPS2, sigma)
        )
        np.fill_diagonal(up, 0.0)
        ref = MASS * up.sum(1)
        got = np.asarray(u)
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() / scale < 1e-5

    def test_potential_variant_leaves_force_identical(self):
        """The with_potential trace must return the force-only trace's
        acceleration bitwise (channel 3 is additive-only)."""
        pos3 = self._clustered(seed=5)
        box, r_c = 2048.0, 216.0
        gn = int(box // r_c)
        a0, d0 = near_field_tree(aos(pos3), box, MASS, EPS2, r_c, gn)
        a1, _, d1 = near_field_tree(
            aos(pos3), box, MASS, EPS2, r_c, gn, with_potential=True
        )
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
        assert int(d0) == int(d1)

    def test_out_of_box_particles_get_zero_potential(self):
        pos3 = self._clustered(seed=9)
        pos3[:7] = 5000.0  # far outside the box
        box, r_c = 2048.0, 216.0
        gn = int(box // r_c)
        _, u, _ = near_field_tree(
            aos(pos3), box, MASS, EPS2, r_c, gn, with_potential=True
        )
        u = np.asarray(u)
        assert (u[:7] == 0.0).all()
        assert np.isfinite(u).all()

    def test_pallas_interpret_matches_xla_potential(self, monkeypatch):
        from multi_adapter_particles_tpu.ops import dispatch

        pos3 = self._clustered(seed=21)
        box, r_c = 2048.0, 216.0
        gn = int(box // r_c)
        _, u_xla, _ = near_field_tree(
            aos(pos3), box, MASS, EPS2, r_c, gn, with_potential=True,
            block=128,
        )
        monkeypatch.setattr(dispatch, "pallas_supported", lambda: True)
        _, u_pl, _ = near_field_tree(
            aos(pos3), box, MASS, EPS2, r_c, gn, with_potential=True,
            block=128,
        )
        np.testing.assert_array_equal(np.asarray(u_xla), np.asarray(u_pl))


class TestHalfPairPotential:
    """`half_pairs` (round 5): Newton-3rd halved potential-only
    enumeration. The pair potential is symmetric and the gauge consumes
    only the total 0.5*sum(u), so each unordered block pair is swept
    once (diagonals weighted 1/2 in-sweep) — ~2x fewer pair
    interactions. The TOTAL must match the directed enumeration to f32
    accumulation-order rounding on every sweep path."""

    def _clustered(self, n=768, seed=11):
        rng = np.random.default_rng(seed)
        pos3 = np.concatenate([
            rng.normal(0, 90, (n // 2, 3)),
            rng.normal(250, 50, (n - n // 2, 3)),
        ]).astype(np.float32)
        return pos3

    def _total(self, pos3, half, **kw):
        box, r_c = 2048.0, 216.0
        gn = int(box // r_c)
        u, dropped = near_field_tree(
            aos(pos3), box, MASS, EPS2, r_c, gn,
            with_potential=True, potential_only=True, half_pairs=half,
            **kw,
        )
        return float(0.5 * jnp.sum(u)), int(dropped)

    def _assert_match(self, pos3, **kw):
        t_dir, d_dir = self._total(pos3, False, **kw)
        t_half, d_half = self._total(pos3, True, **kw)
        assert d_dir == 0 and d_half == 0
        assert t_half == pytest.approx(t_dir, rel=2e-6)

    def test_total_matches_directed_xla_fallback(self):
        self._assert_match(self._clustered())

    def test_total_matches_directed_pallas_interpret(self, monkeypatch):
        from multi_adapter_particles_tpu.ops import dispatch

        monkeypatch.setattr(dispatch, "pallas_supported", lambda: True)
        self._assert_match(self._clustered(seed=5), block=128)

    def test_total_matches_on_sliced_path(self, monkeypatch):
        """Tiny sweep_slice_cap forces the multi-invocation SMEM-sliced
        path; halving must hold across slice boundaries."""
        from multi_adapter_particles_tpu.ops import dispatch

        monkeypatch.setattr(dispatch, "pallas_supported", lambda: True)
        self._assert_match(
            self._clustered(seed=7), block=128, sweep_slice_cap=8
        )

    def test_total_matches_under_subblock_expansion(self, monkeypatch):
        """Wide blocks sub-split for the sweep: a parent diagonal pair
        expands to BOTH sub orderings; half mode must keep exactly one
        (and weight sub-diagonals 1/2)."""
        from multi_adapter_particles_tpu.ops import dispatch, treeforce

        monkeypatch.setattr(dispatch, "pallas_supported", lambda: True)
        monkeypatch.setattr(treeforce, "_SWEEP_MAX_BLOCK", 32)
        pos3 = self._clustered(n=1024, seed=13)
        box, r_c = 2048.0, 216.0
        gn = int(box // r_c)
        cap = treeforce.host_sub_pair_budget(
            aos(pos3), box, r_c, gn
        )
        self._assert_match(
            pos3, block=128,
            **({} if cap is None else {"sub_pair_budget": cap}),
        )

    def test_probed_budget_never_drops_in_half_mode(self):
        """`pair_budget` keeps its full-directed-count semantics: the
        internally derived halved cap must still cover every live halved
        pair when the probe sized the directed budget."""
        from multi_adapter_particles_tpu.ops import treeforce

        pos3 = self._clustered(seed=23)
        box, r_c = 2048.0, 216.0
        gn = int(box // r_c)
        budget = treeforce.host_pair_budget(aos(pos3), box, r_c, gn)
        _, dropped = self._total(pos3, True, pair_budget=budget)
        assert dropped == 0

    def test_half_requires_potential_only(self):
        pos3 = self._clustered(seed=3)
        with pytest.raises(ValueError):
            near_field_tree(
                aos(pos3), 2048.0, MASS, EPS2, 216.0, 9,
                with_potential=True, half_pairs=True,
            )

    def test_out_of_box_entries_stay_zero(self):
        pos3 = self._clustered(seed=9)
        pos3[:7] = 5000.0
        box, r_c = 2048.0, 216.0
        gn = int(box // r_c)
        u, _ = near_field_tree(
            aos(pos3), box, MASS, EPS2, r_c, gn,
            with_potential=True, potential_only=True, half_pairs=True,
        )
        u = np.asarray(u)
        assert (u[:7] == 0.0).all()
        assert np.isfinite(u).all()


class TestHalfForceSweep:
    """`half_force` (round 5): Newton-3rd halved FORCE sweep — each
    unordered block pair's plane computed once, applied to both sides
    through the banded persistent-VMEM accumulator
    (`_sweep_kernel_n3`). Same pair set as the directed sweep;
    accumulation order differs (f32 ulp-class divergence, the
    `-halfpair` precedent). The static gate must fall back to the
    directed sweep — with identical results — wherever the banded
    kernel does not apply."""

    def _clustered(self, n=1536, seed=13):
        rng = np.random.default_rng(seed)
        pos3 = np.concatenate([
            rng.normal(0, 90, (n // 2, 3)),
            rng.normal(250, 50, (n - n // 2, 3)),
        ]).astype(np.float32)
        return pos3

    def _accel(self, pos3, half, monkeypatch=None, **kw):
        box, r_c = 2048.0, 216.0
        gn = int(box // r_c)
        a, dropped = near_field_tree(
            aos(pos3), box, MASS, EPS2, r_c, gn, half_force=half, **kw
        )
        return np.asarray(a), int(dropped)

    def test_matches_directed_pallas_interpret(self, monkeypatch):
        from multi_adapter_particles_tpu.ops import dispatch

        monkeypatch.setattr(dispatch, "pallas_supported", lambda: True)
        pos3 = self._clustered()
        a_dir, d0 = self._accel(pos3, False, block=128)
        a_n3, d1 = self._accel(pos3, True, block=128)
        assert d0 == 0 and d1 == 0
        scale = np.abs(a_dir).max()
        assert np.abs(a_n3 - a_dir).max() / scale < 1e-6

    def test_banded_path_matches(self, monkeypatch):
        """Shrinking the jacc budget forces multi-band calls; per-band
        j-side slices must recompose the same field."""
        from multi_adapter_particles_tpu.ops import dispatch, treeforce

        monkeypatch.setattr(dispatch, "pallas_supported", lambda: True)
        pos3 = self._clustered(seed=5)
        a_one, _ = self._accel(pos3, True, block=128)
        monkeypatch.setattr(treeforce, "_N3_JACC_FLOATS", 4 * 128 * 2)
        monkeypatch.setattr(treeforce, "_N3_MAX_BANDS", 1 << 20)
        a_band, d = self._accel(pos3, True, block=128)
        assert d == 0
        scale = np.abs(a_one).max()
        assert np.abs(a_band - a_one).max() / scale < 1e-6

    def test_gate_falls_back_on_xla(self):
        """No Pallas -> the halved list must NOT be built: results are
        BITWISE the directed XLA fallback's."""
        pos3 = self._clustered(seed=7)
        a_dir, _ = self._accel(pos3, False, block=128)
        a_n3, _ = self._accel(pos3, True, block=128)
        np.testing.assert_array_equal(a_n3, a_dir)

    def test_gate_falls_back_on_sliced_lists(self, monkeypatch):
        """A sweep_slice_cap below the halved budget disables the banded
        kernel (it needs the whole list in one SMEM load) — bitwise the
        directed sliced sweep."""
        from multi_adapter_particles_tpu.ops import dispatch

        monkeypatch.setattr(dispatch, "pallas_supported", lambda: True)
        pos3 = self._clustered(seed=9)
        a_dir, _ = self._accel(pos3, False, block=128, sweep_slice_cap=8)
        a_n3, _ = self._accel(pos3, True, block=128, sweep_slice_cap=8)
        np.testing.assert_array_equal(a_n3, a_dir)

    def test_gate_falls_back_on_expansion(self, monkeypatch):
        """Sub-block-expanded scenes (block > sweep width) keep the
        directed sweep."""
        from multi_adapter_particles_tpu.ops import dispatch, treeforce

        monkeypatch.setattr(dispatch, "pallas_supported", lambda: True)
        monkeypatch.setattr(treeforce, "_SWEEP_MAX_BLOCK", 32)
        pos3 = self._clustered(n=1024, seed=11)
        a_dir, _ = self._accel(pos3, False, block=128)
        a_n3, _ = self._accel(pos3, True, block=128)
        np.testing.assert_array_equal(a_n3, a_dir)

    def test_half_force_rejects_potential(self):
        pos3 = self._clustered(seed=3)
        with pytest.raises(ValueError):
            near_field_tree(
                aos(pos3), 2048.0, MASS, EPS2, 216.0, 9,
                with_potential=True, half_force=True,
            )

    def test_through_p3m_matches_directed(self, monkeypatch):
        from multi_adapter_particles_tpu.ops import dispatch

        monkeypatch.setattr(dispatch, "pallas_supported", lambda: True)
        pos = aos(self._clustered(seed=21))
        kw = dict(grid=16, box=2048.0, g_const=70000.0,
                  softening_squared=25.0, near_mode="tree")
        a_dir, _ = p3m.p3m_accel_with_overflow(pos, **kw)
        a_n3, _ = p3m.p3m_accel_with_overflow(pos, half_force=True, **kw)
        a_dir, a_n3 = np.asarray(a_dir), np.asarray(a_n3)
        scale = np.abs(a_dir).max()
        assert np.abs(a_n3 - a_dir).max() / scale < 1e-6

    def test_gate_falls_back_past_band_cap(self, monkeypatch):
        """More than _N3_MAX_BANDS bands would starve the DMA ring
        (measured +23% at 1M) — the gate must take the directed sweep,
        bitwise."""
        from multi_adapter_particles_tpu.ops import dispatch, treeforce

        monkeypatch.setattr(dispatch, "pallas_supported", lambda: True)
        pos3 = self._clustered(seed=17)
        a_dir, _ = self._accel(pos3, False, block=128)
        monkeypatch.setattr(treeforce, "_N3_JACC_FLOATS", 4 * 128 * 2)
        a_n3, _ = self._accel(pos3, True, block=128)
        np.testing.assert_array_equal(a_n3, a_dir)
