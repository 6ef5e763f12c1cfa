"""Training driver: the outer repeat loop with stats, weights, checkpoints.

Equivalent of the reference's training mode (reference __main__.py:12-28):
``num_repeats = num_total // (buffer_len * num_parallel)`` repeats of
(collect rollout -> train actor -> train critic), then artifact dump.
Each phase is one jitted device program; the host loop only sequences
them and harvests per-rollout metrics (SURVEY.md §7.2).

Additions beyond the reference (SURVEY.md §5 prescriptions):
  * optional device-mesh sharding of the env batch + params;
  * Orbax checkpoint of the FULL training state with exact resume
    (the reference saves weights only, with no resume path);
  * throughput logging (env-steps/s) instead of a per-step print.

The reference's save-every-rollout weights quirk (its best-reward gate
never updates, reference models.py:93, 127-129) is preserved: weights are
(over)written to the same timestamped file after every rollout.
"""

from __future__ import annotations

import time
from typing import Optional

import jax

from marlnav_tpu.algo import make_mappo
from marlnav_tpu.config import RunConfig, config_to_json
from marlnav_tpu.env import make_env
import jax.numpy as jnp

from marlnav_tpu.utils.seeding import make_rng
from marlnav_tpu.utils.stats import StatsLogger


def train(
    cfg: RunConfig,
    mesh=None,
    tensor_parallel: bool = False,
    checkpoint_dir: Optional[str] = None,
    checkpoint_interval: int = 10,
    resume: bool = False,
    output_root: Optional[str] = None,
    verbose: bool = True,
    jit_repeats: int = 1,
    fused_collect: bool = False,
    allow_interpret: bool = False,
    pipeline: bool = False,
):
    """Run full MAPPO training per ``cfg``; returns the final TrainState.

    With ``mesh`` the env batch shards over its 'data' axis (and the MLP
    hidden dims over 'model' when ``tensor_parallel``).  With
    ``checkpoint_dir`` the complete state checkpoints every
    ``checkpoint_interval`` rollouts; ``resume=True`` continues from the
    latest checkpoint there.  ``jit_repeats > 1`` runs that many full
    repeats per device program (``MAPPO.train_many``) — same math and the
    same per-repeat logs, but one dispatch per block instead of three per
    repeat (matters on high-dispatch-latency links); weights/checkpoints
    then save once per block.

    ``pipeline=True`` keeps the ``jit_repeats`` block structure (metrics
    fetched and weights/checkpoints saved once per block) but executes
    each block as CHAINED ASYNC dispatches of the per-repeat programs
    instead of one scanned ``train_many`` program.  JAX dispatches run
    ahead of the device, so the link round trips overlap device
    execution; only the block-end metrics fetch synchronizes.  Trade-off
    vs the scanned block: the per-repeat programs compile 2-3x faster
    (the 6-7 min first-compile of big blocked scans on a fresh tunnel
    session is the sweep-iteration tax this exists to cut) at a small
    steady-state dispatch overhead per repeat.
    """
    assert cfg.model is not None, "train requires a model config"
    env = make_env(cfg.env, cfg.init, None)
    # mesh only affects fused updates (shard_mapped phase + gradient psum);
    # the XLA update path shards through jit's automatic partitioning.
    mappo = make_mappo(cfg.model, env, cfg.normalizer, cfg.scaler, mesh=mesh)

    init_rng, loop_rng = jax.random.split(make_rng(cfg.seed))
    ts, env_state = mappo.init(init_rng)

    if mesh is not None:
        from marlnav_tpu.parallel import shard_env_state, shard_train_state

        env_state = shard_env_state(env_state, mesh)
        ts = shard_train_state(ts, mesh, tensor_parallel=tensor_parallel)

    train_actor = jax.jit(mappo.train_actor)
    train_critic = jax.jit(mappo.train_critic)

    if fused_collect:
        from marlnav_tpu.ops import env_state_to_rows, make_fused_collect

        # With a mesh the kernel shard_maps over its 'data' axis; the env
        # rows must be placed with that sharding.
        # Off-TPU the kernel runs under the Pallas interpreter (CI/smoke
        # only: its in-kernel PRNG is degenerate there — see ops notes).
        interpret = jax.devices()[0].platform != "tpu"
        if interpret and not allow_interpret:
            # Training on constant noise is silently wrong — refuse instead
            # of warning (a smoke test can opt in with --allow-interpret).
            raise RuntimeError(
                "--fused-collect off-TPU runs under the Pallas interpreter, "
                "whose in-kernel PRNG is DEGENERATE (constant noise); "
                "refusing to train on it.  Pass --allow-interpret for "
                "smoke tests only.")
        # Tiled updates (ops/fused_update_tiled.py): when the updates are
        # also fused and minibatches are full-batch, the ACTOR update
        # consumes the collect kernel's native tile outputs directly — the
        # canonical->staged relayouts (~15.6 ms of the default-config
        # repeat, BASELINE.md) disappear.  Under a mesh the trainers
        # shard_map over 'data' (round 4): each shard's kernel consumes
        # its own collect tiles and the grad sums psum, exactly like the
        # staged mesh phase.  Hardware-validated and DEFAULT since the
        # v5e composed-repeat benches (scripts/bench_composed.py; numbers
        # in BASELINE.md).  Opt out with MARLNAV_TILED_UPDATES=0
        # (accepted: 0 / false / off).
        import os as _os

        tiled_eligible = (cfg.model.fused_updates
                          and cfg.model.batch_size == cfg.model.buffer_len)
        tiled_path = (tiled_eligible
                      and _os.environ.get("MARLNAV_TILED_UPDATES", "1")
                      .lower() not in ("0", "false", "off", ""))
        # The tiled CRITIC only wins at large env batches (v5e composed
        # repeats, BASELINE.md: 16384 envs 46.4 vs 47.9 ms/repeat, but
        # 1024 envs 56.6 vs 53.5 — its per-epoch kernel is slower than
        # the staged G=1 kernel, and at small P x many epochs that costs
        # more than the one-time values/returns staging it saves).
        # Default: tiled actor everywhere eligible, tiled critic at
        # P >= 8192; force with MARLNAV_TILED_CRITIC=1/0.
        _tc_env = _os.environ.get("MARLNAV_TILED_CRITIC", "").lower()
        critic_tiled = tiled_path and (
            _tc_env in ("1", "true", "on") or
            (_tc_env not in ("0", "false", "off")
             and cfg.model.num_parallel >= 8192))
        if cfg.model.fused_updates and not tiled_path and verbose:
            # The fallback is correct but slower — say so instead of
            # silently routing a mesh / sliced-minibatch run to it.
            why = ("disabled by MARLNAV_TILED_UPDATES" if tiled_eligible
                   else f"sliced minibatches (batch_size "
                        f"{cfg.model.batch_size} != buffer_len "
                        f"{cfg.model.buffer_len})")
            print(f"tiled update path ineligible ({why}); "
                  "using the staged fused-update path")
        fc = make_fused_collect(
            cfg.model, cfg.env, cfg.init, cfg.normalizer, cfg.scaler,
            interpret=interpret, mesh=mesh, return_tiled=tiled_path)
        if tiled_path:
            from marlnav_tpu.ops.fused_update_tiled import (
                make_tiled_actor_trainer,
                make_tiled_critic_trainer,
            )

            train_actor_tiled = jax.jit(make_tiled_actor_trainer(
                cfg.model, interpret=interpret, mesh=mesh))
            if critic_tiled:
                train_critic_tiled = jax.jit(make_tiled_critic_trainer(
                    cfg.model, interpret=interpret, mesh=mesh))
        # Checkpoints always store the canonical EnvState layout (the rows
        # layout is a kernel-internal detail), so resumes work across a
        # --fused-collect flag flip in either direction.
        canon_template = env_state
        env_state = env_state_to_rows(env_state)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            env_state = jax.device_put(
                env_state, jax.tree.map(
                    lambda _: NamedSharding(mesh, P(None, "data")),
                    env_state))
        # Spread seeds while staying in int32 (the kernel seed dtype):
        # bounding base_seed below 2**30 leaves headroom so
        # base_seed + repeat provably cannot wrap int32 for any
        # representable repeat count (the kernel folds (seed, block, chunk)
        # through the PRNG hash, so nearby seeds still give independent
        # streams).
        base_seed = ((cfg.seed if cfg.seed is not None else 0)
                     * 1_000_003) % (1 << 30)

        def do_collect(ts, env_state, repeat):
            return fc(ts, env_state, base_seed + repeat)

        def to_canonical(es_rows, step):
            from marlnav_tpu.ops import rows_to_env_state

            # Fused training threads no jax.random key; synthesize a
            # step-dependent one so a resume WITHOUT --fused-collect gets a
            # valid, per-checkpoint-distinct reset stream.
            return rows_to_env_state(es_rows,
                                     rng=jax.random.fold_in(loop_rng, step))

        from_canonical = env_state_to_rows

        def do_train_many(ts, env_state, start_repeat_, n):
            # Streams derive from absolute repeat numbers (integer seeds),
            # so a block continues exactly where the host loop would.
            def body(carry, r):
                ts, env_state = carry
                if tiled_path:
                    env_state, buffer, metrics, tiled = fc(
                        ts, env_state, base_seed + r)
                    ts, al = train_actor_tiled(ts, buffer, tiled)
                    if critic_tiled:
                        ts, cl = train_critic_tiled(ts, buffer, tiled)
                    else:
                        ts, cl = mappo.train_critic(ts, buffer)
                else:
                    env_state, buffer, metrics = fc(ts, env_state,
                                                    base_seed + r)
                    ts, al = mappo.train_actor(ts, buffer)
                    ts, cl = mappo.train_critic(ts, buffer)
                return (ts, env_state), (metrics, al, cl)

            repeats = start_repeat_ + jnp.arange(n, dtype=jnp.int32)
            (ts, env_state), (mets, al, cl) = jax.lax.scan(
                body, (ts, env_state), repeats)
            return ts, env_state, mets, al, cl
    else:
        tiled_path = False

        def do_collect(ts, env_state, repeat):
            return mappo.collect(ts, env_state,
                                 jax.random.fold_in(loop_rng, repeat))

        do_train_many = None  # mappo.train_many used directly below
        canon_template = env_state

        def to_canonical(es, step):
            return es

        def from_canonical(es):
            return es

    logger = StatsLogger(root=output_root)
    start_repeat = 0

    ckpt = None
    if checkpoint_dir is not None:
        from marlnav_tpu.utils.checkpoint import Checkpointer

        ckpt = Checkpointer(checkpoint_dir, save_interval=checkpoint_interval)
        if resume and ckpt.latest_step() is not None:
            # Checkpoints store the canonical EnvState layout regardless of
            # --fused-collect, so resume works across a flag flip.
            step, (ts, canon), host = ckpt.restore((ts, canon_template))
            env_state = from_canonical(canon)
            start_repeat = step + 1
            if host:
                logger.load_state_dict(host)
            if verbose:
                print(f"resumed from checkpoint at repeat {step}")

    if jit_repeats < 1:
        raise ValueError(f"jit_repeats must be >= 1, got {jit_repeats}")
    m = cfg.model
    steps_per_rollout = m.buffer_len * m.num_parallel
    collect = jax.jit(do_collect)
    if fused_collect:
        train_many = jax.jit(do_train_many, static_argnums=3)
    else:
        train_many = jax.jit(mappo.train_many, static_argnums=3)

    repeat = start_repeat
    while repeat < m.num_repeats:
        # Partial tail blocks run one repeat at a time through the
        # already-compiled single-repeat programs — a distinct block size
        # would recompile the whole training scan for a few repeats.
        remaining = m.num_repeats - repeat
        block = jit_repeats if remaining >= jit_repeats else 1
        t0 = time.perf_counter()
        if block == 1 or pipeline:
            # Chained async per-repeat dispatches; ONE metrics fetch at
            # block end (with pipeline, JAX's async dispatch lets the
            # host run ahead so link round trips overlap device work).
            handles = []
            for r in range(repeat, repeat + block):
                if tiled_path:
                    env_state, buffer, metrics, tiled = collect(
                        ts, env_state, r)
                    ts, actor_losses = train_actor_tiled(ts, buffer, tiled)
                    if critic_tiled:
                        ts, critic_losses = train_critic_tiled(
                            ts, buffer, tiled)
                    else:
                        ts, critic_losses = train_critic(ts, buffer)
                else:
                    env_state, buffer, metrics = collect(ts, env_state, r)
                    ts, actor_losses = train_actor(ts, buffer)
                    ts, critic_losses = train_critic(ts, buffer)
                handles.append((metrics, actor_losses, critic_losses))
            per_repeat = jax.device_get(handles)
        else:
            # fold_in(fold_in(rng, block_start), i) gives each repeat a
            # distinct stream; exact host-loop equality isn't required,
            # only per-repeat independence.
            block_arg = (repeat if fused_collect
                         else jax.random.fold_in(loop_rng, repeat))
            ts, env_state, metrics, actor_losses, critic_losses = train_many(
                ts, env_state, block_arg, block)
            # ONE host transfer for the whole block, then numpy slicing —
            # per-repeat device fetches would reintroduce the round trips
            # this path exists to remove.
            stacked = jax.device_get((metrics, actor_losses, critic_losses))
            per_repeat = [jax.tree.map(lambda x: x[i], stacked)
                          for i in range(block)]
        jax.block_until_ready(ts)
        dt = time.perf_counter() - t0

        for met_i, al_i, cl_i in per_repeat:
            logger.log_rollout(met_i)
            logger.log_losses(al_i, cl_i)
        logger.save_weights(ts)
        if ckpt is not None:
            # Save when this block contains a multiple of the interval
            # (plain step % interval gating would skip every block end
            # whenever jit_repeats doesn't divide the interval).
            last = repeat + block - 1
            crosses = (last // ckpt.save_interval) > ((repeat - 1)
                                                      // ckpt.save_interval)
            ckpt.save(last, (ts, to_canonical(env_state, last)),
                      logger.state_dict(), force=crosses)

        if verbose:
            last_rew = logger.logs["mean_rews"][-1]
            print(
                f"repeat {repeat + block}/{m.num_repeats}: "
                f"mean_rew {last_rew:.3f}, "
                f"{block * steps_per_rollout / dt:,.0f} env-steps/s "
                f"({block} repeat(s) in {dt:.2f}s)"
            )
        repeat += block

    if ckpt is not None and m.num_repeats > start_repeat:
        ckpt.save(m.num_repeats - 1,
                  (ts, to_canonical(env_state, m.num_repeats - 1)),
                  logger.state_dict(), force=True)
        ckpt.close()
    logger.save_stats(config_to_json(cfg))
    return ts, env_state, logger
