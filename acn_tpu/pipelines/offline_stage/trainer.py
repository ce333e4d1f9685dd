"""Outer training driver: loop, eval, checkpointing, occupancy updates.

Counterpart of the reference's ``pipelines/offline_stage/trainer.py``
meta_trainer (trainer.py:9-103): loop over episodic batches up to
``outer_steps``, periodic eval with best-checkpoint saving, step-tagged
checkpoints, resume. Differences: no GradScaler (bf16/fp32 on TPU needs
none), occupancy updates are jitted dense EMA passes, and the renderer
switches stratified → occupancy once warmup concludes (one recompile,
mirroring the reference's ``render_rays`` dispatch, ray_rendering.py:564-574).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from acn_tpu.models.container import ContainerConfig
from acn_tpu.occupancy import grid as occ_grid
from acn_tpu.occupancy.grid import OccConfig
from acn_tpu.parallel.mesh import shard_by_expert_axis
from acn_tpu.pipelines.offline_stage.train_step import (
    make_eval_step,
    make_meta_train_step,
)
from acn_tpu.utils.checkpoint import AsyncCheckpointer, save_checkpoint
from acn_tpu.utils.logging import Logger, MetricLogger, PhaseTimer


class AutoRegime:
    """Marching-regime controller: strided until the budget path is safe.

    The global-budget marcher (march_rays_budget) is ~2× cheaper per step
    than per-ray strided compaction once occupancy has sparsified — but
    switching to it while the grids are still dense drops valid samples
    batch-tail-first, which actively corrupts training: fully-dropped rays
    pull the background MLP toward scene colors and partially-dropped rays
    composite against a truncated transmittance (measured this round:
    54-70% drop at the warmup switch, eval query PSNR falling 14.6 → 12.9
    over 600 steps). The controller keeps the unbiased strided path while
    the measured would-be overflow (march_rays(report_budget=...)) stays
    above ``thresh``, and arms the budget path after ``patience``
    consecutive in-threshold readings. One-way: grids only sparsify under
    a fixed scene; the trainer's >5% advisory still covers regressions.
    """

    def __init__(self, thresh: float = 0.02, patience: int = 3):
        self.thresh = float(thresh)
        self.patience = int(patience)
        self.streak = 0
        self.switched = False

    def observe(self, would_overflow: float) -> bool:
        """Feed one reading; True exactly once — when the switch fires."""
        if self.switched:
            return False
        if would_overflow <= self.thresh:
            self.streak += 1
        else:
            self.streak = 0
        if self.streak >= self.patience:
            self.switched = True
            return True
        return False


def make_occ_update_fn(cfg: ContainerConfig, occ_cfg: OccConfig):
    """Jitted all-expert occupancy EMA update
    (reference meta_container.py:386-389 → meta_ngp.py:355-387)."""

    @jax.jit
    def update_one(expert_p, aabb, occ_state, k):
        density_fn = lambda x: cfg.expert_density(expert_p, cfg.expert, aabb, x)[
            ..., 0
        ]
        step_size = occ_cfg.step_size_for_traced(aabb)
        return occ_grid.update_occ_grid(occ_state, k, density_fn, occ_cfg, step_size)

    def update_all(variables, occ_states, key):
        # sequential over experts: the all-cells density sweep is the largest
        # single computation in the system; vmapping K of them OOMs
        experts = variables["params"]["experts"]
        aabbs = variables["buffers"]["expert_aabbs"]
        K = aabbs.shape[0]
        keys = jax.random.split(key, K)
        states = [
            update_one(
                jax.tree.map(lambda a: a[i], experts),
                aabbs[i],
                jax.tree.map(lambda a: a[i], occ_states),
                keys[i],
            )
            for i in range(K)
        ]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    return update_all


def init_occ_states(expert_aabbs: np.ndarray, occ_cfg: OccConfig):
    """Stacked (K, ...) occupancy states."""
    return jax.vmap(lambda ab: occ_grid.init_occ_state(ab, occ_cfg))(
        jnp.asarray(expert_aabbs)
    )


def dummy_occ_states(num_experts: int):
    """Placeholder stacked leaf so vmapped steps have something to map over
    when occupancy is disabled."""
    return jnp.zeros((num_experts,), jnp.float32)


def meta_trainer(
    P,
    cfg: ContainerConfig,
    state: Dict[str, Any],
    optimizer,
    train_sampler,
    test_sampler,
    logger: Logger,
    occ_cfg: Optional[OccConfig] = None,
    occ_states=None,
    mesh=None,
    start_step: int = 0,
    best: float = float("-inf"),
    device_pools=None,
) -> Dict[str, Any]:
    """Run meta-training; returns the final state.

    With ``device_pools`` (see tasks.build_device_pools), episodic sampling
    fuses into the jitted step — the loop body issues exactly one device
    computation and zero host transfers per step."""
    from acn_tpu.pipelines.offline_stage.train_step import make_device_batch_fn

    K = cfg.num_submodules
    use_occ = occ_cfg is not None
    occ_ready = use_occ and start_step >= occ_cfg.warmup_steps

    if occ_states is None:
        occ_states = (
            init_occ_states(np.asarray(state["variables"]["buffers"]["expert_aabbs"]), occ_cfg)
            if use_occ
            else dummy_occ_states(K)
        )

    if device_pools is not None:
        device_pools = {k: jnp.asarray(v) for k, v in device_pools.items()}
        sample_fn = make_device_batch_fn(
            int(P.batch_size), int(P.support_rays), int(P.query_rays)
        )

    # Marching-regime resolution (see AutoRegime): with a configured budget,
    # --occ_regime auto (default) trains strided-with-measurement until the
    # would-be drop rate clears the safety threshold, then switches to the
    # ~2× faster budget path; 'budget'/'strided' force a regime. The
    # decision persists through checkpoints via P.occ_regime = 'budget'.
    budget_cfg = int(getattr(P, "occ_budget_per_ray", 0) or 0)
    regime_flag = str(getattr(P, "occ_regime", "auto") or "auto")
    budget_active = budget_cfg > 0 and regime_flag == "budget"
    auto = budget_cfg > 0 and regime_flag == "auto"
    regime_ctl = (
        AutoRegime(
            thresh=float(getattr(P, "occ_auto_thresh", 0.02) or 0.02),
            patience=int(getattr(P, "occ_auto_patience", 3) or 3),
        )
        if auto
        else None
    )

    def build_train_step(with_occ_render: bool, with_budget: bool):
        oc = occ_cfg if with_occ_render else None
        base_step = make_meta_train_step(
            cfg, P, optimizer, oc,
            budget_override=(budget_cfg if with_budget else 0),
            report_budget=(budget_cfg if (auto and not with_budget) else 0),
        )
        if device_pools is not None:

            def fused(state, pools, occ, key):
                k_s, k_t = jax.random.split(key)
                batch = sample_fn(pools, k_s)
                return base_step(state, batch, occ, k_t)

            return jax.jit(fused, donate_argnums=(0,))
        return jax.jit(base_step, donate_argnums=(0,))

    def build_eval_step(with_occ_render: bool):
        # Mid-train eval defaults to the train renderer ('dispatch',
        # reference ray_rendering.py:564-574): past the warmup switch the occ
        # path samples 256 occupancy-concentrated bins per ray — finer where
        # surfaces are — and reads ~3 dB higher on a sharp field than 96
        # uniform stratified samples. --eval_render stratified pins one
        # instrument across the switch instead.
        oc = occ_cfg if with_occ_render else None
        eval_oc = oc if getattr(P, "eval_render", "dispatch") == "dispatch" else None
        return jax.jit(make_eval_step(cfg, P, eval_oc))

    train_step = build_train_step(occ_ready, budget_active)
    eval_step = build_eval_step(occ_ready)
    occ_update = make_occ_update_fn(cfg, occ_cfg) if use_occ else None

    if occ_ready and occ_states is not None and use_occ:
        # resuming past warmup with freshly premarked (empty) grids: refresh
        # from the restored densities now or the first steps render nothing
        key_occ0 = jax.random.PRNGKey(P.seed + 77)
        occ_states = occ_update(state["variables"], occ_states, key_occ0)

    if mesh is not None:
        state = shard_by_expert_axis(state, mesh, K)
        occ_states = shard_by_expert_axis(occ_states, mesh, K)
        if device_pools is not None:
            device_pools = shard_by_expert_axis(device_pools, mesh, K)

    metric_log = MetricLogger()
    logger.add_region_layout(K)
    timer = PhaseTimer()
    ckpt = AsyncCheckpointer()  # saves run off the training path
    key = jax.random.PRNGKey(P.seed)

    # jax.profiler trace capture (SURVEY §5): --profile_at N traces steps
    # [N, N + profile_steps) into <logdir>/profile for tensorboard/xprof
    profile_at = int(getattr(P, "profile_at", 0) or 0)
    profile_steps = int(getattr(P, "profile_steps", 3) or 3)
    profiling = False

    # stall watchdog: the remote-TPU tunnel occasionally wedges a transfer
    # forever (no timeout surfaces). If no loop progress for
    # --watchdog_timeout seconds, hard-exit with code 42 so a supervisor can
    # relaunch with --checkpoint_path resume. 0 disables.
    watchdog_timeout = float(getattr(P, "watchdog_timeout", 900) or 0)
    progress = {"t": time.monotonic(), "step": start_step}
    if watchdog_timeout > 0:
        import os as _os
        import threading as _threading

        def _watchdog():
            while True:
                time.sleep(30.0)
                if time.monotonic() - progress["t"] > watchdog_timeout:
                    print(
                        f"[watchdog] no progress past step {progress['step']} "
                        f"for {watchdog_timeout:.0f}s — exiting 42 for resume",
                        flush=True,
                    )
                    _os._exit(42)

        _threading.Thread(target=_watchdog, daemon=True).start()

    # the loop watchdog is armed — hand over from the runner's startup
    # watchdog (utils/startup.py), which covered client creation + restore
    from acn_tpu.utils import startup as _startup

    _startup.mark_ready()

    # graceful shutdown: SIGTERM/SIGINT finish the current step, save the
    # full 'last' checkpoint (incl. occupancy states), then return
    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        stop_requested["flag"] = True
        logger.log(f"[trainer] signal {signum} → finishing step and saving")

    import signal as _signal

    prev_handlers = {}
    for sig in (_signal.SIGTERM, _signal.SIGINT):
        try:
            prev_handlers[sig] = _signal.signal(sig, _request_stop)
        except (ValueError, OSError):  # non-main thread
            pass

    step = start_step
    t_loop = time.perf_counter()
    rays_per_step = (
        K * P.batch_size * (P.support_rays * P.inner_iter + P.query_rays)
    )
    while step < P.outer_steps and not stop_requested["flag"]:
        if device_pools is not None:
            batch = device_pools  # sampling fused into the jitted step
        else:
            timer.tic("data")
            batch_np = train_sampler.sample_batch(P.batch_size)
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
            if mesh is not None:
                batch = shard_by_expert_axis(batch, mesh, K)
            timer.toc("data")

        if profile_at and step + 1 == profile_at:
            jax.profiler.start_trace(str(logger.logdir) + "/profile")
            profiling = True

        key, k_step = jax.random.split(key)
        timer.tic("step")
        state, metrics = train_step(state, batch, occ_states, k_step)
        step += 1
        progress["t"] = time.monotonic()
        progress["step"] = step
        # sync only on logging steps: device_get blocks on the full step chain
        # (and the remote-TPU tunnel adds a round trip per sync)
        will_log = step % P.print_step == 0 or step == 1
        if will_log:
            metrics = jax.device_get(metrics)
        timer.toc("step")

        if profiling and step >= profile_at + profile_steps:
            jax.block_until_ready(metrics["loss_total"])
            jax.profiler.stop_trace()
            profiling = False
            logger.log(f"[profiler] trace saved to {logger.logdir}/profile")

        # occupancy maintenance (reference meta_train_step.py:176-177)
        if use_occ:
            if step % occ_cfg.update_interval == 0:
                key, k_occ = jax.random.split(key)
                occ_states = occ_update(state["variables"], occ_states, k_occ)
            if not occ_ready and step >= occ_cfg.warmup_steps:
                occ_ready = True
                logger.log("[OCC] warmup concluded → occupancy renderer")
                train_step = build_train_step(True, budget_active)
                eval_step = build_eval_step(True)

        if will_log:
            metric_log.update(
                loss=float(metrics["loss_total"]),
                psnr_in=float(np.mean(metrics["psnr_in"])),
                psnr_out=float(np.mean(metrics["psnr_out"])),
            )

        if will_log:
            phases = timer.reset()
            dt = time.perf_counter() - t_loop
            t_loop = time.perf_counter()
            logger.log(
                f"step {step}/{P.outer_steps} {metric_log} "
                f"| {dt / max(P.print_step, 1):.3f}s/it "
                f"({rays_per_step / max(dt / max(P.print_step, 1), 1e-9):,.0f} rays/s) "
                f"| data {phases.get('data', 0):.2f}s step {phases.get('step', 0):.2f}s"
            )
            logger.scalar("train/loss", metrics["loss_total"], step)
            for r in range(K):
                logger.scalar(f"train/psnr_out/region_{r}", metrics["psnr_out"][r], step)
                logger.scalar(f"train/loss_out/region_{r}", metrics["loss_out"][r], step)
            logger.scalar("train/grad_norm", metrics["grad_norm"], step)
            ovf = float(metrics.get("occ_overflow", 0.0))
            if auto and occ_ready and not budget_active:
                # strided regime measuring: ovf is the WOULD-BE drop rate
                # at the configured budget — nothing is actually dropped
                logger.scalar("train/occ_would_overflow", ovf, step)
                if regime_ctl.observe(ovf):
                    budget_active = True
                    P.occ_regime = "budget"  # persists via checkpoint P
                    logger.log(
                        f"[occ] auto-regime: would-drop {ovf:.1%} ≤ "
                        f"{regime_ctl.thresh:.0%} for {regime_ctl.patience} "
                        f"readings — switching to the global-budget marcher "
                        f"(budget {budget_cfg}/ray)"
                    )
                    train_step = build_train_step(True, True)
            elif ovf > 0:
                logger.scalar("train/occ_budget_overflow", ovf, step)
                if ovf > 0.05:
                    logger.log(
                        f"[occ] budget overflow {ovf:.1%} — valid samples are "
                        "being dropped; raise --occ_budget_per_ray"
                    )

        if test_sampler is not None and step % P.eval_step == 0:
            key, k_eval = jax.random.split(key)
            eval_metrics = []
            for _ in range(int(P.max_test_tasks)):
                tb = test_sampler.sample_batch(P.test_batch_size)
                tb = {k: jnp.asarray(v) for k, v in tb.items()}
                if mesh is not None:
                    tb = shard_by_expert_axis(tb, mesh, K)
                k_eval, k_one = jax.random.split(k_eval)
                em = eval_step(state["variables"], tb, occ_states, k_one)
                eval_metrics.append(jax.device_get(em))
            psnr = float(np.mean([m["psnr"] for m in eval_metrics]))
            logger.scalar("eval/psnr", psnr, step)
            logger.log(f"[eval] step {step} query PSNR {psnr:.3f} (best {best:.3f})")
            if psnr > best:
                best = psnr
                # occ grids are regenerable (premark + warmup) and dominate
                # checkpoint size — only the final 'last' save keeps them
                # (the reference intended the same stripping, utils.py:283-289)
                # params-only: best checkpoints serve eval/serving; resume
                # uses the step-tagged saves (which carry the optimizer)
                ckpt.save(
                    logger.logdir, "best", state["variables"],
                    opt_state=None, occ_states=None,
                    P=P, step=step, best=best, is_best=True,
                )
                logger.log(f"[ckpt] new best ({best:.3f}) save queued")

        if step % P.save_step == 0:
            # Full resume state: optimizer + occupancy grids ride along so a
            # watchdog relaunch never silently resets Adam moments or the
            # marched grids (round-2 quality runs resumed lossily several
            # times per run). The 'step' coalesce key bounds pending
            # snapshots to one — HBM stays flat even when the tunnel is slow;
            # --save_optimizer 0 drops back to params-only if HBM is tight.
            save_opt = bool(getattr(P, "save_optimizer", True))
            ckpt.save(
                logger.logdir, f"step{step}", state["variables"],
                opt_state=state["opt_state"] if save_opt else None,
                occ_states=occ_states if use_occ else None,
                P=P, step=step, best=best,
                coalesce_key="step",
            )

    ckpt.wait()  # drain queued async saves before the final blocking one
    save_checkpoint(
        logger.logdir, "last", state["variables"],
        opt_state=state["opt_state"], occ_states=occ_states if use_occ else None,
        P=P, step=step, best=best,
    )
    for sig, h in prev_handlers.items():
        _signal.signal(sig, h)
    logger.log(f"training complete at step {step}; best eval PSNR {best:.3f}")
    state["occ_states"] = occ_states
    return state
