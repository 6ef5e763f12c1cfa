"""Pallas TPU kernel: the ENTIRE random-policy rollout fused into one op.

The XLA rollout (bench.py / MAPPO collect) runs ~30 fused kernels per env
step, each round-tripping the (P, ...) state through HBM.  This kernel
keeps a block of environments *resident in VMEM for the whole trajectory*:
grid = env blocks, and inside each program a ``fori_loop`` runs all T
steps of

  observation geometry -> normalize -> actor MLP -> Gaussian sample
  (on-core PRNG + Box-Muller) -> dynamics -> rewards/terminations ->
  auto-reset draw + mask blend

writing only the (T, P) rewards to HBM.  HBM traffic per env step drops
from ~25 state round trips to 4 output bytes.  (The training-buffer
variant that also emits observations/actions/log-probs/values lives in
fused_collect.py; both kernels share their physics via step_math.py.)

Layout: each block holds 1024 envs viewed as an (8, 128) VPU tile —
sublane x lane — so EVERY elementwise op runs at full vector-unit
utilization.  Per-agent quantities are (A, 8, 128), per-obstacle
(O, 8, 128); the actor (12 -> H -> 2x2 heads, reference models.py:14-36,
NO hidden activation) collapses to one precomposed (4, 12) affine
operator (fused_update._affine_compose — the identical trick that made
the affine update kernel 4.4x) computed as scalar-broadcast FMAs over
(8, 128) tiles, reading the 52 operator scalars from SMEM inside the
loop (an MXU matmul would need a per-step relayout that costs more than
it saves at these sizes).

Semantics match marlnav_tpu.env.env.step / reward / dynamics op-for-op
(which themselves replicate the reference, reference environment.py:92-269)
with these documented deviations:
  * action noise and obstacle re-draws come from the TPU core PRNG, so
    trajectories differ from the jax.random path distribution-preservingly;
  * acos is the Hastings polynomial (Mosaic has no acos lowering), f32-
    exact to ~2e-8;
  * the heading reward is ``dot > cos(max_angle_diff)`` (exactly
    equivalent to ``|acos(dot)| < max_angle_diff`` — acos is monotone)
    with the env's zeroed-angle-inside-cap_distance quirk special-cased;
  * episode statistics counters are not accumulated (bench path only —
    the collect kernel accumulates them).

Supports ``deterministic_actions`` (policy mean, no sampling) for
tight-tolerance tests against the XLA path, TPU-semantics interpret mode
on CPU via ``interpret=True``, and host-injected noise via
``noise_input=True`` (deterministic replay + CPU tests, since the
interpreter's in-kernel PRNG is non-functional in this jax version).

Measured on one TPU v5e chip at 16384 envs, T=500: 305-372M env-steps/s
(~4.5x the XLA lax.scan path at its own optimum, ~80M; >30x the 10M
BASELINE.json multi-host north-star).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from marlnav_tpu.config import (
    EnvParams,
    NormalizerConfig,
    ScalerConfig,
    TriangleInitConfig,
)
from marlnav_tpu.ops.fused_update import _affine_compose
from marlnav_tpu.ops.step_math import (
    BLOCK_ENVS,
    LANE,
    SUB,
    StepMath,
    uniform01,
)

# Re-exported for tests and historical callers.
from marlnav_tpu.ops.step_math import (  # noqa: F401
    acos as _acos,
    bits_to_uniform as _bits_to_uniform,
    box_muller as _box_muller,
)

_SUB, _LANE = SUB, LANE


class RowState(NamedTuple):
    """Transposed env state: env axis last (on TPU lanes).

    px, py   (A, P) agent positions
    dx, dy   (A, P) unit headings
    sp       (A, P) speeds
    obx, oby (O, P) obstacle positions
    tg       (2, P) target position [x; y]
    misc     (2, P) [step_num; target-reach latch], both as float32
    """

    px: jax.Array
    py: jax.Array
    dx: jax.Array
    dy: jax.Array
    sp: jax.Array
    obx: jax.Array
    oby: jax.Array
    tg: jax.Array
    misc: jax.Array


def env_state_to_rows(state) -> RowState:
    """EnvState (P-leading) -> RowState (P-last)."""
    s = state.states  # (P, A, 5)
    return RowState(
        px=s[:, :, 0].T, py=s[:, :, 1].T,
        dx=s[:, :, 2].T, dy=s[:, :, 3].T, sp=s[:, :, 4].T,
        obx=state.obstacles[:, :, 0].T, oby=state.obstacles[:, :, 1].T,
        tg=state.target[:, 0, :].T,
        misc=jnp.stack([state.step_num.astype(jnp.float32),
                        state.terminates.astype(jnp.float32)]),
    )


def rows_to_env_arrays(rows: RowState):
    """RowState -> (states (P,A,5), obstacles (P,O,2), target (P,1,2),
    step_num (P,) int32, latch (P,) bool)."""
    states = jnp.stack([rows.px, rows.py, rows.dx, rows.dy, rows.sp],
                       axis=-1).transpose(1, 0, 2)
    obstacles = jnp.stack([rows.obx, rows.oby], axis=-1).transpose(1, 0, 2)
    target = rows.tg.T[:, None, :]
    return (states, obstacles, target,
            rows.misc[0].astype(jnp.int32), rows.misc[1] > 0.5)


def rows_to_env_state(rows: RowState, rng: jax.Array, stats=None):
    """RowState -> canonical ``EnvState`` — the checkpoint interchange
    layout, so checkpoints written with and without ``--fused-collect`` are
    interchangeable (fused training threads no key through the state, so a
    fresh ``rng`` must be supplied; ``stats`` defaults to zeros — they are
    harvested and reset per rollout anyway)."""
    from marlnav_tpu.env.types import EnvState, EpisodeStats

    states, obstacles, target, step_num, latch = rows_to_env_arrays(rows)
    return EnvState(
        states=states, obstacles=obstacles, target=target,
        step_num=step_num, terminates=latch,
        stats=stats if stats is not None else EpisodeStats.zeros(), rng=rng,
    )


def untile(tiled: jax.Array, num_envs: int) -> jax.Array:
    """(T, 8, nb*128) tile-layout output -> (T, P): env p maps to
    (block, sublane, lane) = (p // 1024, (p % 1024) // 128, p % 128)."""
    t = tiled.shape[0]
    nb = num_envs // BLOCK_ENVS
    return (tiled.reshape(t, SUB, nb, LANE)
            .transpose(0, 2, 1, 3).reshape(t, num_envs))


def make_fused_rollout(
    env_params: EnvParams,
    init_cfg: TriangleInitConfig,
    normalizer_cfg: NormalizerConfig,
    scaler_cfg: ScalerConfig,
    num_steps: int,
    deterministic_actions: bool = False,
    interpret: bool = False,
    noise_input: bool = False,
):
    """Build ``rollout(rows, actor_params, seed) -> (rows', rewards)``.

    ``rows`` is a RowState over P envs (P % 1024 == 0); ``seed`` a scalar
    int32 (per-block streams are derived from it); ``rewards`` is
    (num_steps, P).  Covers the 3-agent triangle scenario family including
    ``noisy_ags`` resets; mock/diagnostic scenarios use the XLA path.
    """
    sm = StepMath(env_params, init_cfg, normalizer_cfg, scaler_cfg)
    a, o, n_rows, n_draws = sm.a, sm.o, sm.n_rows, sm.n_draws

    def kernel(seed_ref,
               px0, py0, dx0, dy0, sp0, obx0, oby0, tg0, misc0,
               *rest):
        if noise_input:
            noise_ref, *rest = rest
        else:
            noise_ref = None
        (wa, ca,
         rew_out, pxf, pyf, dxf, dyf, spf, obxf, obyf, tgf, miscf,
         st) = rest
        # Variadic seeding folds (seed, block) through the PRNG's hash,
        # so adjacent seeds do NOT produce overlapping per-block streams
        # (additive seed+block would make block j of seed s identical to
        # block j-1 of seed s+1).
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))

        def uniforms(t, k, n):
            """n uniform (8,128) tiles for step t, draw slots k..k+n-1.

            From the in-kernel PRNG normally; from the host-provided noise
            input in test mode (interpret-mode prng_random_bits is broken
            in this jax version — returns zeros inside kernels)."""
            if noise_input:
                return [noise_ref[t, k + j] for j in range(n)]
            u = uniform01((n, _SUB, _LANE))
            return [u[j] for j in range(n)]

        # ---- load the block into the 3D (rows, 8, 128) scratch ----
        st[:] = jnp.concatenate(
            [px0[:], py0[:], dx0[:], dy0[:], sp0[:], obx0[:], oby0[:],
             tg0[:], misc0[:]], axis=0,
        ).reshape(n_rows, _SUB, _LANE)

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

            # Policy observations (post-reinit state of prev step).
            feats_all = sm.obs_feats(px, py, hx, hy, obx, oby, tx, ty)

            # Actor forward + Gaussian sample.  One PRNG draw per step;
            # each Box-Muller pair yields BOTH normals an agent needs.
            if not deterministic_actions:
                un = uniforms(t, 0, 2 * a)
            ang_raw, acc_raw = [], []
            for i in range(a):
                mu, var = sm.actor_affine(feats_all[i], wa, ca,
                                          want_var=not deterministic_actions)
                if deterministic_actions:
                    ang_raw.append(mu[0])
                    acc_raw.append(mu[1])
                else:
                    z0, z1 = _box_muller(un[2 * i], un[2 * i + 1])
                    ang_raw.append(mu[0] + jnp.sqrt(var[0]) * z0)
                    acc_raw.append(mu[1] + jnp.sqrt(var[1]) * z1)

            npx, npy, nhx, nhy, nsp = sm.dynamics(px, py, hx, hy, sp,
                                                  ang_raw, acc_raw)
            step_num = step_num + 1.0
            trunc = step_num > float(sm.p.episode_len - 1)

            reward, all_in_target, any_coll = sm.rewards(
                npx, npy, nhx, nhy, obx, oby, tx, ty, px, py)
            # Rewards are written in the native (8,128) tile layout — the
            # host-side wrapper untiles them once per rollout.
            rew_out[pl.ds(t, 1), :, :] = reward.reshape(1, _SUB, _LANE)

            terminated = jnp.maximum(any_coll, latch)
            finished = jnp.maximum(terminated, jnp.where(trunc, 1.0, 0.0))
            new_latch = jnp.where(latch > 0.5, 0.0, all_in_target)

            u = uniforms(t, 2 * a, sm.n_reset_draws)
            sm.reset_blend(st, finished, 1.0 - finished, npx, npy, nhx, nhy,
                           nsp, obx, oby, step_num, new_latch, u)
            return 0

        # Interpret mode (CPU tests): prng_random_bits yields zeros inside
        # a rolled fori_loop, so unroll the time loop there.  Compiled TPU
        # kernels keep the rolled loop (code size).
        jax.lax.fori_loop(0, num_steps, step, 0, unroll=bool(interpret))

        # ---- write the block back out in the 2D row layout ----
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

    def rollout(rows: RowState, actor, seed, noise=None):
        a_comp, c_comp = _affine_compose(actor)
        num_envs = rows.px.shape[-1]
        if noise_input and noise is None:
            raise ValueError("noise_input=True requires a noise array "
                             f"({num_steps}, {n_draws}, {_SUB}, num_envs//{_SUB})")
        if num_envs % BLOCK_ENVS != 0:
            raise ValueError(
                f"num_envs {num_envs} not divisible by {BLOCK_ENVS}")
        grid = (num_envs // BLOCK_ENVS,)

        def row_spec(rows_dim):
            return pl.BlockSpec((rows_dim, BLOCK_ENVS), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        state_specs = [row_spec(a)] * 5 + [row_spec(o)] * 2 + [row_spec(2),
                                                               row_spec(2)]
        # Weights live in SMEM: they are consumed as individual scalars
        # (broadcast FMAs), which is exactly what scalar memory is for.
        # The actor ships as its precomposed (4, obs) affine operator
        # (step_math.actor_affine / fused_update._affine_compose).
        param_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        noise_specs, noise_args = [], []
        if noise_input:
            noise_specs = [pl.BlockSpec(
                (num_steps, n_draws, _SUB, _LANE), lambda i: (0, 0, 0, i),
                memory_space=pltpu.VMEM)]
            noise_args = [noise]
        state_shapes = [
            jax.ShapeDtypeStruct(x.shape, jnp.float32)
            for x in (rows.px, rows.py, rows.dx, rows.dy, rows.sp,
                      rows.obx, rows.oby, rows.tg, rows.misc)
        ]
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + state_specs + noise_specs + param_specs,
            out_specs=[pl.BlockSpec((num_steps, _SUB, _LANE),
                                    lambda i: (0, 0, i),
                                    memory_space=pltpu.VMEM)]
            + state_specs,
            out_shape=[jax.ShapeDtypeStruct(
                (num_steps, _SUB, grid[0] * _LANE), jnp.float32)]
            + state_shapes,
            scratch_shapes=[pltpu.VMEM((n_rows, _SUB, _LANE), jnp.float32)],
            interpret=pltpu.InterpretParams() if interpret else False,
        )(
            jnp.asarray([seed], jnp.int32),
            rows.px, rows.py, rows.dx, rows.dy, rows.sp,
            rows.obx, rows.oby, rows.tg, rows.misc,
            *noise_args,
            a_comp, c_comp[:, None],
        )
        tiled, *state = out
        return RowState(*state), untile(tiled, num_envs)

    return rollout
