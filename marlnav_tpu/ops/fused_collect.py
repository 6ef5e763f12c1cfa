"""Pallas TPU kernel: the MAPPO training rollout (collect) fused into one op.

Extends the bench kernel (fused_rollout.py — same physics via
step_math.py) to emit the full training buffer the PPO updates consume:
normalized observations, raw sampled actions, per-agent log-probs,
rewards, done flags, and the episode-ending statistics counters — the
exact record `MAPPO.collect` builds with a lax.scan (algo/mappo.py),
produced by one VMEM-resident kernel instead.  The centralized critic's
values complete the buffer OUTSIDE the kernel (`_critic_on_tiles`): they
feed nothing inside the step, so they run as one post-kernel MXU
contraction over the emitted obs tiles rather than ~1,850 scalar-FMA VPU
ops per env-step on the sequential critical path; the actor runs
in-kernel as its precomposed (4, 12) affine operator (the reference
actor has no hidden activation — fused_update._affine_compose).

Unlike the bench kernel, the outputs here are large (the buffer IS the
product), so the grid is 2-D: (env blocks, time chunks).  Time chunks
iterate fastest; the env-state scratch persists across the chunks of a
block (initialized at chunk 0, flushed to the state outputs whose block
index only depends on the env block), so each chunk's outputs stream
through a small VMEM window while the trajectory stays resident.

Log-prob identity used: actions are reconstructed as mu + sqrt(var) * z,
so (a - mu)^2 / var == z^2 and
  log p(a) = -0.5 * (2*log(2*pi) + log v0 + log v1 + z0^2 + z1^2)
— matching DiagGaussian.log_prob (models/distributions.py) exactly.

RNG provenance differs from the jax.random path (TPU core PRNG), as for
the bench kernel; everything else is op-for-op.  Supports interpret mode
+ host-injected noise for CPU tests (see fused_rollout.py notes).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from marlnav_tpu.algo.mappo import (
    Buffer,
    RolloutMetrics,
    discounted_returns,
    discounted_returns_assoc,
    gae_advantages,
    gae_advantages_assoc,
    reference_returns,
    reference_returns_assoc,
)
from marlnav_tpu.config import MAPPOConfig
from marlnav_tpu.env.types import EpisodeStats
from marlnav_tpu.models import critic_apply
from marlnav_tpu.ops.fused_rollout import RowState, untile
from marlnav_tpu.ops.fused_update import _affine_compose
from marlnav_tpu.ops.step_math import (
    BLOCK_ENVS,
    LANE,
    SUB,
    StepMath,
    box_muller,
    uniform01,
)

_LOG_2PI = math.log(2.0 * math.pi)


def _untile_rows(x: jax.Array, num_envs: int) -> jax.Array:
    """(T, R, 8, nb*128) tiled feature-rows output -> (T, P, R)."""
    t, r = x.shape[0], x.shape[1]
    nb = num_envs // BLOCK_ENVS
    return (x.reshape(t, r, SUB, nb, LANE)
            .transpose(0, 3, 2, 4, 1).reshape(t, num_envs, r))


def _time_chunk(num_steps: int, cap: int = 16) -> int:
    """Largest divisor of num_steps <= cap (VMEM window per grid step)."""
    for c in range(min(cap, num_steps), 0, -1):
        if num_steps % c == 0:
            return c
    return 1


def make_fused_collect(
    cfg: MAPPOConfig,
    env_params,
    init_cfg,
    normalizer_cfg,
    scaler_cfg,
    interpret: bool = False,
    noise_input: bool = False,
    mesh=None,
    axis: str = "data",
    return_tiled: bool = False,
    generic_interpret: bool = False,
    assoc_returns: bool | None = None,
    tw_cap: int | None = None,
):
    """Build ``collect(ts, rows, seed[, noise]) -> (rows', Buffer,
    RolloutMetrics)`` — a drop-in for ``MAPPO.collect`` operating on the
    RowState layout.  ``seed`` is a scalar int32; per-(block, chunk)
    PRNG streams derive from it.

    With ``mesh`` the kernel runs one instance per device via shard_map
    with the env batch sharded over ``axis`` (distinct per-shard PRNG
    streams); the untiling and returns processing stay ordinary sharded
    XLA, so the buffer-wide normalization reductions become the only
    collectives — inserted automatically.

    With ``return_tiled`` the collect additionally returns the kernel's
    RAW per-step obs/actions/log-probs (a ``TiledRollout``, zero extra
    cost — they are the pre-untile outputs), which the tiled update path
    consumes directly (ops/fused_update_tiled.py), bypassing the
    canonical->staged relayouts.

    ``generic_interpret`` (requires ``noise_input``) runs the kernel
    under Pallas's GENERIC interpreter — pure traced JAX, no TPU-core
    simulator — instead of ``pltpu.InterpretParams()``.  The simulator's
    shared-memory io_callbacks wedge when shard_map runs concurrent
    kernel instances (the r2 deadlock, CLAUDE.md); the generic
    interpreter has no shared runtime state, so it is the ONLY mode in
    which the collect kernel's mesh path executes at >1 shard off-TPU —
    tests/test_fused_collect.py::test_two_shard_mesh_generic_interpret's
    coverage of the §2.6 DP row."""
    if generic_interpret and not noise_input:
        raise ValueError("generic_interpret requires noise_input=True "
                         "(the generic interpreter has no in-kernel PRNG)")
    interp_param = (True if generic_interpret
                    else pltpu.InterpretParams() if interpret else False)
    sm = StepMath(env_params, init_cfg, normalizer_cfg, scaler_cfg)
    a, o, n_rows, n_draws = sm.a, sm.o, sm.n_rows, sm.n_draws
    num_steps = cfg.buffer_len
    if tw_cap is None:
        import os as _os
        # Round-5 sweep (BASELINE.md round-5): the collect kernel's time
        # window was hardcoded 16 through round 4; per-chunk costs
        # (reseed, output-window switch) amortize with the window like
        # the tiled update kernels' (whose measured-best cap is 37).
        tw_cap = int(_os.environ.get("MARLNAV_COLLECT_TW_CAP", "16"))
    t_chunk = _time_chunk(num_steps, tw_cap)
    n_chunks = num_steps // t_chunk
    obs_size = sm.obs_size
    obs_rows = a * obs_size
    if assoc_returns is None:
        import os as _os
        env_v = _os.environ.get("MARLNAV_ASSOC_RETURNS", "")
        if env_v:
            assoc_returns = env_v != "0"
        else:
            # Measured routing (BASELINE.md round-5, bench_collect): the
            # associative pass wins where the sequential scan is
            # LATENCY-bound (small P: default config 9.93 -> 9.70 ms)
            # and loses where its log2(T) extra (T, P) passes are HBM
            # traffic (16k GAE: 43.7 -> 45.2 ms) — same shape of
            # tradeoff as the tiled-critic P>=8192 routing, opposite
            # sign.
            assoc_returns = cfg.num_parallel < 8192
    if assoc_returns:
        _disc_returns, _gae_adv, _ref_returns = (
            discounted_returns_assoc, gae_advantages_assoc,
            reference_returns_assoc)
    else:
        _disc_returns, _gae_adv, _ref_returns = (
            discounted_returns, gae_advantages, reference_returns)

    def kernel(seed_ref,
               px0, py0, dx0, dy0, sp0, obx0, oby0, tg0, misc0,
               *rest):
        if noise_input:
            noise_ref, *rest = rest
        else:
            noise_ref = None
        (wa, ca,
         rew_out, obs_out, act_out, lp_out, done_out, stats_out,
         pxf, pyf, dxf, dyf, spf, obxf, obyf, tgf, miscf,
         st, stats) = rest
        block_id = pl.program_id(0)
        chunk_id = pl.program_id(1)
        # Independent stream per (seed, block, chunk) — chunks would
        # otherwise repeat their noise after each reseed.  Mosaic folds at
        # most 2 seed values, so block/chunk combine into one.  Under the
        # GENERIC interpreter there is no PRNG implementation at all —
        # host noise replaces every draw, so seeding is skipped (a no-op
        # on the draw-free path either way).
        if not generic_interpret:
            pltpu.prng_seed(seed_ref[0], block_id * n_chunks + chunk_id)

        @pl.when(chunk_id == 0)
        def _():
            st[:] = jnp.concatenate(
                [px0[:], py0[:], dx0[:], dy0[:], sp0[:], obx0[:], oby0[:],
                 tg0[:], misc0[:]], axis=0,
            ).reshape(n_rows, SUB, LANE)
            stats[:] = jnp.zeros((3, SUB, LANE), jnp.float32)

        def uniforms(t, k, n):
            if noise_input:
                return [noise_ref[t, k + j] for j in range(n)]
            u = uniform01((n, SUB, LANE))
            return [u[j] for j in range(n)]

        def step(t, _):
            px = [st[sm.PX + i] for i in range(a)]
            py = [st[sm.PY + i] for i in range(a)]
            hx = [st[sm.DX + i] for i in range(a)]
            hy = [st[sm.DY + i] for i in range(a)]
            sp = [st[sm.SP + i] for i in range(a)]
            obx = [st[sm.OBX + i] for i in range(o)]
            oby = [st[sm.OBY + i] for i in range(o)]
            tx, ty = st[sm.TG], st[sm.TG + 1]
            step_num = st[sm.SN]
            latch = st[sm.LAT]

            feats_all = sm.obs_feats(px, py, hx, hy, obx, oby, tx, ty)
            obs_out[pl.ds(t, 1)] = jnp.concatenate(
                [f[None] for feats in feats_all for f in feats], axis=0,
            ).reshape(1, obs_rows, SUB, LANE)

            un = uniforms(t, 0, 2 * a)
            ang_raw, acc_raw, lp = [], [], []
            for i in range(a):
                mu, var = sm.actor_affine(feats_all[i], wa, ca,
                                          want_var=True)
                z0, z1 = box_muller(un[2 * i], un[2 * i + 1])
                ang_raw.append(mu[0] + jnp.sqrt(var[0]) * z0)
                acc_raw.append(mu[1] + jnp.sqrt(var[1]) * z1)
                lp.append(-0.5 * (2.0 * _LOG_2PI + jnp.log(var[0])
                                  + jnp.log(var[1]) + z0 * z0 + z1 * z1))
            act_out[pl.ds(t, 1)] = jnp.concatenate(
                [v[None] for pair in zip(ang_raw, acc_raw) for v in pair],
                axis=0,
            ).reshape(1, 2 * a, SUB, LANE)
            lp_out[pl.ds(t, 1)] = jnp.concatenate(
                [v[None] for v in lp], axis=0).reshape(1, a, SUB, LANE)

            # NB no critic here: its value feeds nothing inside the step
            # (only the buffer), so it is hoisted out of the kernel and
            # computed post-kernel from the obs tiles (_critic_on_tiles).

            npx, npy, nhx, nhy, nsp = sm.dynamics(px, py, hx, hy, sp,
                                                  ang_raw, acc_raw)
            step_num = step_num + 1.0
            trunc = jnp.where(step_num > float(sm.p.episode_len - 1),
                              1.0, 0.0)

            reward, all_in_target, any_coll = sm.rewards(
                npx, npy, nhx, nhy, obx, oby, tx, ty, px, py)
            rew_out[pl.ds(t, 1), :, :] = reward.reshape(1, SUB, LANE)

            terminated = jnp.maximum(any_coll, latch)
            finished = jnp.maximum(terminated, trunc)
            new_latch = jnp.where(latch > 0.5, 0.0, all_in_target)
            done_out[pl.ds(t, 1), :, :] = finished.reshape(1, SUB, LANE)

            # On-device episode stats (env/types.py EpisodeStats): the
            # reference syncs these per step (environment.py:98, 210-211).
            stats[0] = stats[0] + trunc
            stats[1] = stats[1] + any_coll
            stats[2] = stats[2] + all_in_target

            u = uniforms(t, 2 * a, sm.n_reset_draws)
            sm.reset_blend(st, finished, 1.0 - finished, npx, npy, nhx, nhy,
                           nsp, obx, oby, step_num, new_latch, u)
            return 0

        jax.lax.fori_loop(0, t_chunk, step, 0,
                          unroll=bool(interpret or generic_interpret))

        # State + stats outputs' block index ignores the chunk dimension;
        # flush only after a block's LAST chunk (mirroring the chunk-0
        # init) instead of redundantly every chunk.
        @pl.when(chunk_id == n_chunks - 1)
        def _():
            flat = st[:].reshape(n_rows, BLOCK_ENVS)
            pxf[:] = flat[sm.PX:sm.PX + a]
            pyf[:] = flat[sm.PY:sm.PY + a]
            dxf[:] = flat[sm.DX:sm.DX + a]
            dyf[:] = flat[sm.DY:sm.DY + a]
            spf[:] = flat[sm.SP:sm.SP + a]
            obxf[:] = flat[sm.OBX:sm.OBX + o]
            obyf[:] = flat[sm.OBY:sm.OBY + o]
            tgf[:] = flat[sm.TG:sm.TG + 2]
            miscf[:] = flat[sm.SN:sm.SN + 2]
            stats_out[:] = stats[:]

    def run_kernel(rows: RowState, actor, seed, noise):
        a_comp, c_comp = _affine_compose(actor)
        num_envs = rows.px.shape[-1]
        if num_envs % BLOCK_ENVS != 0:
            raise ValueError(
                f"num_envs {num_envs} not divisible by {BLOCK_ENVS}")
        if noise_input and noise is None:
            raise ValueError("noise_input=True requires a noise array")
        nb = num_envs // BLOCK_ENVS
        grid = (nb, n_chunks)

        def row_spec(rows_dim):
            return pl.BlockSpec((rows_dim, BLOCK_ENVS), lambda i, j: (0, i),
                                memory_space=pltpu.VMEM)

        def chunk_spec(rows_dim):
            """(T, rows, 8, nb*128) outputs, one (t_chunk, ...) window."""
            return pl.BlockSpec((t_chunk, rows_dim, SUB, LANE),
                                lambda i, j: (j, 0, 0, i),
                                memory_space=pltpu.VMEM)

        def chunk_shape(rows_dim):
            return jax.ShapeDtypeStruct(
                (num_steps, rows_dim, SUB, nb * LANE), jnp.float32)

        state_specs = [row_spec(a)] * 5 + [row_spec(o)] * 2 + [row_spec(2),
                                                               row_spec(2)]
        state_shapes = [
            jax.ShapeDtypeStruct(x.shape, jnp.float32)
            for x in (rows.px, rows.py, rows.dx, rows.dy, rows.sp,
                      rows.obx, rows.oby, rows.tg, rows.misc)
        ]
        param_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        noise_specs, noise_args = [], []
        if noise_input:
            noise_specs = [pl.BlockSpec(
                (t_chunk, n_draws, SUB, LANE), lambda i, j: (j, 0, 0, i),
                memory_space=pltpu.VMEM)]
            noise_args = [noise]

        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + state_specs + noise_specs + param_specs,
            out_specs=[
                pl.BlockSpec((t_chunk, SUB, LANE), lambda i, j: (j, 0, i),
                             memory_space=pltpu.VMEM),  # rewards
                chunk_spec(obs_rows),
                chunk_spec(2 * a),
                chunk_spec(a),
                pl.BlockSpec((t_chunk, SUB, LANE), lambda i, j: (j, 0, i),
                             memory_space=pltpu.VMEM),  # done
                pl.BlockSpec((3, SUB, LANE), lambda i, j: (0, 0, i),
                             memory_space=pltpu.VMEM),  # stats
            ] + state_specs,
            out_shape=[
                jax.ShapeDtypeStruct((num_steps, SUB, nb * LANE),
                                     jnp.float32),
                chunk_shape(obs_rows),
                chunk_shape(2 * a),
                chunk_shape(a),
                jax.ShapeDtypeStruct((num_steps, SUB, nb * LANE),
                                     jnp.float32),
                jax.ShapeDtypeStruct((3, SUB, nb * LANE), jnp.float32),
            ] + state_shapes,
            scratch_shapes=[
                pltpu.VMEM((n_rows, SUB, LANE), jnp.float32),
                pltpu.VMEM((3, SUB, LANE), jnp.float32),
            ],
            interpret=interp_param,
        )(
            jnp.asarray([seed], jnp.int32),
            rows.px, rows.py, rows.dx, rows.dy, rows.sp,
            rows.obx, rows.oby, rows.tg, rows.misc,
            *noise_args,
            a_comp, c_comp[:, None],
        )
        (rew, obs_t, act_t, lp_t, done_t, stats_t, *state) = out
        return RowState(*state), rew, obs_t, act_t, lp_t, done_t, stats_t

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        n_shards = mesh.shape[axis]
        row_p = RowState(*([P(None, axis)] * 9))

        def per_shard(rows, actor, seed, noise):
            shard_seed = seed + jax.lax.axis_index(axis) * (1 << 20)
            return run_kernel(rows, actor, shard_seed,
                              noise if noise_input else None)

        sharded_run = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(row_p, P(), P(), P(None, None, None, axis)),
            out_specs=(row_p, P(None, None, axis),
                       P(None, None, None, axis), P(None, None, None, axis),
                       P(None, None, None, axis), P(None, None, axis),
                       P(None, None, axis)),
            check_vma=False,  # pallas out_shapes carry no vma metadata
        )

    def dispatch_kernel(rows, actor, seed, noise):
        if mesh is None:
            return run_kernel(rows, actor, seed, noise)
        num_envs = rows.px.shape[-1]
        if num_envs % (n_shards * BLOCK_ENVS) != 0:
            raise ValueError(
                f"num_envs {num_envs} not divisible by {n_shards} shards "
                f"x {BLOCK_ENVS}-env blocks")
        if noise is None:
            noise = jnp.zeros((1, 1, 1, n_shards), jnp.float32)
        return sharded_run(rows, actor,
                           jnp.asarray(seed, jnp.int32), noise)

    def _critic_on_tiles(critic, obs_t):
        """Centralized critic hoisted OUT of the kernel: its value output
        feeds nothing inside the step (only the buffer), so it runs
        post-kernel as one feature-major contraction over the obs tiles —
        MXU work at XLA's default matmul precision, exactly like the XLA
        collect's critic_apply (models/networks.py) — instead of ~1,850
        scalar-FMA VPU ops per env-step on the kernel's critical path.
        obs_t (T, A*F, 8, NB*128) -> values (T, 8, NB*128); the 4-D
        einsums keep the env (last) axis intact so the mesh path's
        per-shard sharding propagates without a relayout."""
        h = jax.nn.relu(
            jnp.einsum("fh,tfse->thse", critic.fc1.w, obs_t,
                       preferred_element_type=jnp.float32)
            + critic.fc1.b[None, :, None, None])
        return (jnp.einsum("h,thse->tse", critic.fc2.w[:, 0], h,
                           preferred_element_type=jnp.float32)
                + critic.fc2.b[0])

    def collect(ts, rows: RowState, seed, noise=None):
        """Fused-kernel drop-in for ``MAPPO.collect`` (algo/mappo.py):
        same Buffer layout and returns processing, RowState env state."""
        num_envs = rows.px.shape[-1]
        rows2, rew, obs_t, act_t, lp_t, done_t, stats_t = dispatch_kernel(
            rows, ts.actor, seed, noise)

        rewards = untile(rew, num_envs)  # (T, P)
        obs = _untile_rows(obs_t, num_envs).reshape(
            num_steps, num_envs, a, obs_size)
        actions = _untile_rows(act_t, num_envs).reshape(
            num_steps, num_envs, a, 2)
        log_probs = _untile_rows(lp_t, num_envs).reshape(
            num_steps, num_envs * a)
        values = untile(_critic_on_tiles(ts.critic, obs_t), num_envs)[..., None]
        done = untile(done_t, num_envs) > 0.5

        # Returns processing — same estimators as algo/mappo.py collect.
        # On the fused path the reverse recursions default to the
        # associative O(log T) form (algo/mappo.py round-5 note): at the
        # reference-sized T=1000 the sequential scan is ~5 ms of pure
        # per-step latency in the post-kernel tail.  Reassociation-level
        # fp difference only; MARLNAV_ASSOC_RETURNS=0 restores the
        # sequential scans (and returns_f64 always uses them).
        if cfg.use_gae:
            mean_rew = jnp.mean(_disc_returns(rewards, done, cfg.gamma))
            last_value = critic_apply(ts.critic, final_obs(rows2))[:, 0]
            adv = _gae_adv(rewards, done, values[..., 0], last_value,
                           cfg.gamma, cfg.gae_lambda)
            rets = adv + values[..., 0]
        else:
            rets, mean_rew = _ref_returns(rewards, done, cfg)

        stats = EpisodeStats(
            num_trunc=jnp.sum(stats_t[0]).astype(jnp.int32),
            num_col=jnp.sum(stats_t[1]).astype(jnp.int32),
            num_tar=jnp.sum(stats_t[2]).astype(jnp.int32),
        )
        buffer = Buffer(obs, actions, log_probs, values, rets, done)
        metrics = RolloutMetrics(mean_rew, stats)
        if return_tiled:
            from marlnav_tpu.ops.fused_update_tiled import TiledRollout

            return rows2, buffer, metrics, TiledRollout(obs_t, act_t, lp_t)
        return rows2, buffer, metrics

    def final_obs(rows2: RowState):
        """(P, A, obs) normalized observations of the final state, for the
        GAE bootstrap value — plain XLA on the converted row layout."""
        from marlnav_tpu.env import geometry
        from marlnav_tpu.env.env import _observations
        from marlnav_tpu.ops.fused_rollout import rows_to_env_arrays
        from marlnav_tpu.utils.transforms import make_obs_normalizer

        states, obstacles, target, _, _ = rows_to_env_arrays(rows2)
        obs = _observations(states, obstacles, target, sm.p,
                            geometry.others_indices(a))
        return make_obs_normalizer(normalizer_cfg)(obs)

    # Decomposition handle (scripts/bench_collect.py): the raw kernel
    # dispatch without the untile/critic/returns tail.
    collect.run_kernel = dispatch_kernel
    return collect
