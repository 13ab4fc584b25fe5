"""Orchestrator — the `class Particles` analog (`Particles/Particles.cpp`).

Owns both engines, brokers the shared-positions handle between them, runs
the per-frame pipeline, and handles live reconfiguration (device
re-assignment with drain + state migration — `Particles.cpp:458-537`).

Frame pipeline (`Particles::Draw`, `Particles.cpp:432-456`):

    1. render.draw(display_positions)   # consumes the *last completed* sim
    2. compute.simulate()               # next step, concurrent with the draw
    3. display_positions <- new state
    4. present()                        # the single host block per frame

Step 1 dispatches before step 2, so the draw reads the pre-donation buffer;
XLA/PjRt keeps it alive until the draw executes. That reproduces the
reference's stale-by-one-frame contract: render shows frame N while N+1
simulates (fences `Render.cpp:925`, `Compute.cpp:1012`).
"""

from __future__ import annotations

import time
from typing import List, Optional

from multi_adapter_particles_tpu.config import AppConfig, RenderConfig, SimConfig
from multi_adapter_particles_tpu.runtime import devices as devmod
from multi_adapter_particles_tpu.runtime.compute_engine import ComputeEngine
from multi_adapter_particles_tpu.runtime.render_engine import RenderEngine
from multi_adapter_particles_tpu.utils.metrics import MetricsRegistry


class ParticlesApp:
    def __init__(
        self,
        app_config: Optional[AppConfig] = None,
        sim_config: Optional[SimConfig] = None,
        render_config: Optional[RenderConfig] = None,
        compute_adapter: Optional[int] = None,
        render_adapter: Optional[int] = None,
        seed: int = 0,
        draw_enabled: bool = True,
        profile_every: int = 0,
        mesh_devices: int = 0,
        debug: bool = False,
        fused: bool = False,
        async_timers: Optional[bool] = None,
        timer_window_every: int = 128,
        shard_render: bool = False,
    ):
        """`mesh_devices` > 1 runs the compute role on a mesh of that many
        devices (sharded sim + ring force exchange) — the multi-adapter
        split scaled out; 0/1 = single-device compute engine.
        `shard_render` additionally shards the RENDER role over the same
        mesh (renderer.render_mesh): each device rasterizes its particle
        shard and only (color, transmittance) image pairs cross devices —
        O(pixels) frame traffic instead of the reference's O(N) position
        copy (`Render.cpp:814`).

        `debug` enables the validation layer (D3D12 debug-layer analog):
        donation off, per-frame finiteness + hand-off checks."""
        self.app = app_config or AppConfig()
        self.sim_config = sim_config or SimConfig(
            num_particles=self.app.num_particles
        )
        self.render_config = render_config or RenderConfig()
        self.metrics = MetricsRegistry()
        self.seed = seed
        # SPACE-toggle analog (`Main-Particles.cpp:83-88`).
        self.draw_enabled = draw_enabled
        self.shard_render = shard_render
        # Every K frames, time sim/render with a hard sync (precise but
        # pipeline-perturbing); 0 = never. The non-stalling default timing
        # path is the AsyncStageProbe below.
        self.profile_every = profile_every
        # Bounded dispatch-ahead for -novsync (SetMaximumFrameLatency
        # analog, Render.cpp:298-308): at most `max_frame_latency` frames
        # in flight, enforced by blocking on the oldest frame's marker.
        from multi_adapter_particles_tpu.runtime.gputimer import (
            ProfilerStageTimer,
        )
        from multi_adapter_particles_tpu.runtime.pacing import (
            FrameLatencyQueue,
        )

        self.pacing = FrameLatencyQueue(self.app.max_frame_latency)
        # Non-stalling per-stage device timing (D3D12GpuTimer analog):
        # windowed XLA-profiler traces, parsed off-thread. Default: on when
        # the GUI overlay shows timer rows; off in debug mode (quiet
        # pipeline) and for -nogui throughput runs.
        if async_timers is None:
            async_timers = self.app.gui and not debug
        self.stage_timer = (
            ProfilerStageTimer(self.metrics, window_every=timer_window_every)
            if async_timers
            else None
        )

        self.adapters: List[devmod.AdapterInfo] = devmod.enumerate_adapters()
        compute_ad, render_ad = devmod.assign_adapters(
            self.adapters, compute_adapter, render_adapter
        )
        if fused and compute_adapter is None and render_adapter is None:
            # fused = the single-adapter async-compute analog: an
            # unspecified assignment binds both roles to one device rather
            # than the default split
            render_ad = compute_ad
        self.compute_adapter = compute_ad
        self.render_adapter = render_ad
        # prev-value change detection (`Particles.cpp:162-166,458-463`)
        self._prev_compute_index = compute_ad.index
        self._prev_render_index = render_ad.index
        self._prev_use_extension = self.app.use_queue_extension
        self._prev_fullscreen = self.app.fullscreen

        self.mesh_devices = mesh_devices
        self.extension = None
        self.debug = debug
        self.fused_engine = None
        if fused:
            if mesh_devices > 1 or compute_ad.device != render_ad.device:
                raise ValueError(
                    "fused mode needs a single shared device (the "
                    "async-compute analog)"
                )
            from multi_adapter_particles_tpu.runtime.fused import FusedEngine

            self.fused_engine = FusedEngine(
                self.sim_config, self._active_render_config(),
                compute_ad.device, self.metrics, seed=seed,
                donate=not debug,
                stage_markers=self.stage_timer is not None,
            )
            # one object serves both roles (zero copies, one program)
            self.compute = self.fused_engine
            self.render = self.fused_engine
            self.share_handles()
            self.frame_count = 0
            self.metrics.gauge(
                "mode_banner",
                "Single Adapter with Async Compute (fused single-program)",
            )
            return
        if mesh_devices > 1:
            from multi_adapter_particles_tpu.parallel import (
                MeshComputeEngine,
                make_mesh,
            )

            devices = [
                a.device
                for a in self.adapters
                if a.platform == compute_ad.platform
            ][:mesh_devices]
            if len(devices) < mesh_devices:
                raise ValueError(
                    f"mesh of {mesh_devices} requested but only "
                    f"{len(devices)} {compute_ad.platform} devices exist"
                )
            self.compute = MeshComputeEngine(
                self.sim_config, make_mesh(devices), self.metrics, seed=seed,
                donate=not debug,
            )
        else:
            from multi_adapter_particles_tpu.utils.extension import (
                ExtensionHelper,
            )

            self.extension = ExtensionHelper(
                compute_ad.device, enabled=self.app.use_queue_extension
            )
            self.compute = ComputeEngine(
                self.sim_config, compute_ad.device, self.metrics, seed=seed,
                extension=self.extension,
                donate=not debug,  # debug: no aliasing, hazards can't hide
            )
        self.render = RenderEngine(
            self._active_render_config(), render_ad.device, self.metrics
        )
        self.share_handles()
        self.frame_count = 0

    def _active_render_config(self) -> RenderConfig:
        """The resolution the render engine runs at right now: the
        windowed config, or its fullscreen-resolution variant when the
        runtime fullscreen toggle is on (`Render.cpp:287-413`)."""
        return self.render_config.resolved(self.app.fullscreen)

    # -- handle brokering (`Particles::ShareHandles`, Particles.cpp:191-208) ----
    def share_handles(self) -> None:
        self._display_positions = self.compute.positions
        if self.mesh_devices > 1:
            self.async_mode = False
            sharded_render = self.shard_render and isinstance(
                self.render, RenderEngine
            )
            if sharded_render:
                self.render.mesh = self.compute.mesh
            self.metrics.gauge(
                "mode_banner",
                f"Multi-Chip Mesh Compute ({self.mesh_devices} devices)"
                + (" + sharded render" if sharded_render
                   else " + render consume"),
            )
            self.metrics.gauge("mesh", f"{self.mesh_devices}x1 particles-axis")
        else:
            if isinstance(self.render, RenderEngine):
                self.render.mesh = None  # rescale to 1 device: gather path
            self.async_mode = (
                self.compute_adapter.device == self.render_adapter.device
            )
            self.metrics.gauge(
                "mode_banner",
                devmod.mode_banner(self.compute_adapter, self.render_adapter),
            )
        self.metrics.gauge("compute_device", self.compute_adapter.description)
        self.metrics.gauge("render_device", self.render_adapter.description)

    # -- elastic mesh rescale (BASELINE "runtime shard rebalancing") ------------
    def set_mesh_devices(self, k: int) -> None:
        """Live-rescale the compute role to a k-device mesh (or back to a
        single device with k <= 1): drain -> re-shard -> resume."""
        from multi_adapter_particles_tpu.parallel import (
            MeshComputeEngine,
            make_mesh,
        )

        self.render.wait_for_gpu()
        self.compute.wait_for_gpu()
        if k > 1:
            devices = [
                a.device
                for a in self.adapters
                if a.platform == self.compute_adapter.platform
            ][:k]
            if len(devices) < k:
                raise ValueError(f"only {len(devices)} devices for mesh of {k}")
            self.compute = MeshComputeEngine(
                self.sim_config, make_mesh(devices), self.metrics,
                prev=self.compute, donate=not self.debug,
            )
        else:
            self.compute = ComputeEngine(
                self.sim_config, self.compute_adapter.device, self.metrics,
                prev=self.compute, extension=self.extension,
                donate=not self.debug,
            )
        self.mesh_devices = k
        self.share_handles()

    # -- per-frame pipeline -------------------------------------------------------
    def draw(self) -> None:
        """One frame: draw N, simulate N+1, present (`Particles.cpp:432-456`)."""
        self.metrics.frame_tick()
        num_sim, num_copy, num_draw = self.app.resolved_counts()
        if self.stage_timer is not None:
            # device-clock stage timing: trace a short window of frames
            # every so often, resolved off-thread (no pipeline stalls)
            self.stage_timer.on_frame(self.frame_count)

        if self.fused_engine is not None:
            eng = self.fused_engine
            eng.frame(
                self.app,
                num_sim=(
                    num_sim
                    if num_sim < self.sim_config.num_particles else None
                ),
                # SPACE toggle in fused mode: draw 0 sprites (the program
                # shape is fixed; XLA DCEs most of the render work)
                num_draw=num_draw if self.draw_enabled else 0,
            )
            if self.app.vsync and self.draw_enabled:
                eng.present()  # the single host block per frame
            else:
                # dispatch-ahead with bounded in-flight depth
                self.pacing.push(eng.positions)
            self._display_positions = eng.positions
            self.frame_count += 1
            self._handle_reconfiguration()
            return
        # profile on the LAST frame of each window so the first sample is
        # post-compile (frame 0 would fold 30+ s of compilation into the EMA)
        profile = (
            self.profile_every > 0
            and self.frame_count % self.profile_every
            == self.profile_every - 1
        )

        if self.draw_enabled:
            if profile:
                st = self.metrics.stage("render")
                st.begin()
                self.render.draw(
                    self._display_positions, self.app, num_copy, num_draw
                )
                self.render.present()
                st.end()
            else:
                self.render.draw(
                    self._display_positions, self.app, num_copy, num_draw
                )

        if profile:
            st = self.metrics.stage("simulate")
            self.compute.wait_for_gpu()
            st.begin()
            self.compute.simulate(
                num_sim if num_sim < self.sim_config.num_particles else None
            )
            self.compute.wait_for_gpu()
            st.end()
        else:
            self.compute.simulate(
                num_sim if num_sim < self.sim_config.num_particles else None
            )

        self._display_positions = self.compute.positions

        if not profile:
            if self.app.vsync and self.draw_enabled:
                # present: the only host block per frame (Particles.cpp:452-456)
                self.render.present()
            else:
                # -novsync (or draw-off): dispatch ahead, bounded to
                # max_frame_latency in-flight frames by the latency queue
                src = (
                    self.render.last_frame
                    if self.draw_enabled and self.render.last_frame is not None
                    else self._display_positions
                )
                self.pacing.push(src)

        if self.debug:
            from multi_adapter_particles_tpu.utils import debug as dbg

            dbg.validate_handoff(self._display_positions)
            self.compute.wait_for_gpu()
            dbg.validate_state(
                self.compute.state,
                num_particles=self.sim_config.num_particles,
                where=f"frame {self.frame_count}",
            )

        self.frame_count += 1
        self._handle_reconfiguration()

    # -- live reconfiguration (`Particles.cpp:458-537`) ---------------------------
    def set_compute_adapter(self, index: int) -> None:
        self.compute_adapter = self.adapters[index]

    def set_render_adapter(self, index: int) -> None:
        self.render_adapter = self.adapters[index]

    def _handle_reconfiguration(self) -> None:
        # extension toggle only: flip the compile mode, no rebuild
        # (`Particles.cpp:533-537` -> Compute.cpp:148-157 queue recreate)
        if self.app.use_queue_extension != self._prev_use_extension:
            self._prev_use_extension = self.app.use_queue_extension
            ext = getattr(self.compute, "extension", None)
            if ext is not None:
                self.compute.wait_for_gpu()
                ext.set_enabled(self.app.use_queue_extension)
                self.compute._step_fast = None

        cchange = self.compute_adapter.index != self._prev_compute_index
        rchange = self.render_adapter.index != self._prev_render_index
        # fullscreen/resolution change: drain + render-engine rebuild at
        # the new resolution (`Particles.cpp:458-463,488-509` — the
        # swap-chain/fullscreen machinery `Render.cpp:287-413`); camera
        # and renderer dup state survive, sim state is untouched.
        fschange = self.app.fullscreen != self._prev_fullscreen
        if not (cchange or rchange or fschange):
            return

        if self.fused_engine is not None:
            # fused mode binds both roles to ONE device: a change must move
            # both together, rebuilding the fused engine with state migration
            if self.compute_adapter.device != self.render_adapter.device:
                raise ValueError(
                    "fused mode needs compute and render on the same device;"
                    " move both adapters together (or restart split)"
                )
            from multi_adapter_particles_tpu.runtime.fused import FusedEngine

            self.fused_engine.wait_for_gpu()
            old = self.fused_engine
            self.fused_engine = FusedEngine(
                self.sim_config, self._active_render_config(),
                self.compute_adapter.device, self.metrics,
                prev=old, donate=not self.debug,
                stage_markers=old.stage_markers,
            )
            self.fused_engine.camera = old.camera
            # the lossless dup window is learned state (auto-raise):
            # carry it so the rebuilt program keeps big sprites intact
            if (old.renderer.dup_y, old.renderer.dup_x) != (
                self.fused_engine.renderer.dup_y,
                self.fused_engine.renderer.dup_x,
            ):
                self.fused_engine.renderer.dup_y = old.renderer.dup_y
                self.fused_engine.renderer.dup_x = old.renderer.dup_x
                self.fused_engine._fused = self.fused_engine._rebuild_fused()
            self.compute = self.fused_engine
            self.render = self.fused_engine
            self._prev_compute_index = self.compute_adapter.index
            self._prev_render_index = self.render_adapter.index
            self._prev_fullscreen = self.app.fullscreen
            self.share_handles()
            return

        # Drain all in-flight work on both engines (Particles.cpp:467-471).
        self.render.wait_for_gpu()
        self.compute.wait_for_gpu()

        if rchange or fschange:
            # Rebuild the render engine on the (possibly new) device at the
            # active resolution (camera survives — the reference recreates
            # it but the view is static state here; the learned dup window
            # survives too so big sprites stay lossless).
            from multi_adapter_particles_tpu.render.renderer import Renderer

            old_rend = self.render.renderer
            rcfg = self._active_render_config()
            renderer = Renderer(
                rcfg,
                seg_q=old_rend.seg_q,
                dup_y=old_rend.dup_y,
                dup_x=old_rend.dup_x,
                blend=old_rend.blend,
                auto_raise_dup=old_rend.auto_raise_dup,
            )
            self.render = RenderEngine(
                rcfg,
                self.render_adapter.device,
                self.metrics,
                camera=self.render.camera,
                renderer=renderer,
            )
            self._prev_render_index = self.render_adapter.index
            self._prev_fullscreen = self.app.fullscreen

        if cchange:
            # New engine on the new device, migrating state (CopyState).
            # A compute-adapter change while a mesh is active collapses the
            # mesh back to one device, so drop the mesh bookkeeping first —
            # otherwise share_handles keeps the mesh banner/gauge and
            # async_mode=False while compute actually runs single-device.
            if self.mesh_devices > 1:
                self.mesh_devices = 0
                self.metrics.gauges.pop("mesh", None)
            self.compute = ComputeEngine(
                self.sim_config,
                self.compute_adapter.device,
                self.metrics,
                prev=self.compute,
                extension=self.extension,
                donate=not self.debug,
            )
            self._prev_compute_index = self.compute_adapter.index

        self.share_handles()

    # -- run loop (the message-pump analog, Main-Particles.cpp:76-90) -------------
    def run(
        self,
        num_frames: int,
        frame_callback=None,
        target_fps: Optional[float] = None,
    ) -> None:
        """Drive `num_frames` frames. `target_fps` is the vsync analog."""
        interval = 1.0 / target_fps if target_fps else 0.0
        for _ in range(num_frames):
            t0 = time.perf_counter()
            self.draw()
            if frame_callback is not None:
                frame_callback(self)
            if interval:
                left = interval - (time.perf_counter() - t0)
                if left > 0:
                    time.sleep(left)

    def shutdown(self) -> None:
        """Drain everything (`~Particles`, Particles.cpp:174-185)."""
        self.pacing.close()
        if self.stage_timer is not None:
            self.stage_timer.close()
        self.render.wait_for_gpu()
        self.compute.wait_for_gpu()
