"""MAPPO — multi-agent PPO with a centralized critic, fully on-device.

The reference trainer (reference models.py:59-316) steps the env from
Python one step at a time, with per-step host syncs and prints; here the
entire rollout is ONE jitted ``lax.scan`` over ``buffer_len`` and each
training phase is one jitted program (``lax.scan`` over epochs), so a whole
(collect → train actor → train critic) repeat is three device programs.

Faithful-semantics notes (all verified against the reference, SURVEY.md
§2.5) — active when ``cfg.faithful`` (default):

* Returns, not GAE: reverse scan ``curr = where(done, 0, r + gamma*curr)``
  — the terminal step's own reward is zeroed, truncated episodes are not
  bootstrapped (reference models.py:131-148); then the WHOLE buffer of
  returns is z-normalized with the *sample* std (torch.std_mean unbiased).
* Advantage mis-pairing: the reference tiles rewards/values with
  ``Tensor.repeat`` where the log-prob flatten order needs a
  repeat-interleave (reference models.py:285-286), mis-pairing advantages
  with agents whenever A > 1.
* Last-step drop: a minibatch that reaches the buffer end slices to ``-1``,
  silently dropping the final buffer step (reference models.py:167-171).
* Actor loss is *maximized* (Adam ``maximize=True``, reference
  models.py:71-72) — implemented as minimizing its negation, which is
  identical update-for-update (Adam is sign-symmetric).

``faithful=False`` fixes the pairing + last-step drop; ``use_gae=True``
additionally switches the advantage estimator to bootstrapped GAE (the
estimator the reference never implemented).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from marlnav_tpu.config import MAPPOConfig, NormalizerConfig, ScalerConfig
from marlnav_tpu.env.env import Env
from marlnav_tpu.env.types import EnvState, EpisodeStats
from marlnav_tpu.models import (
    ActorParams,
    CriticParams,
    DiagGaussian,
    actor_apply,
    actor_init,
    critic_apply,
    critic_init,
)
from marlnav_tpu.utils.transforms import make_action_scaler, make_obs_normalizer


class TrainState(NamedTuple):
    actor: ActorParams
    critic: CriticParams
    actor_opt: optax.OptState
    critic_opt: optax.OptState


class Buffer(NamedTuple):
    """Stacked rollout buffer, time-major (T leading), matching the
    reference's per-step record layout (reference models.py:121)."""

    obs: jax.Array  # (T, P, A, obs) normalized pre-step observations
    actions: jax.Array  # (T, P, A, 2) raw [-1,1]-scale sampled actions
    log_probs: jax.Array  # (T, P*A)
    values: jax.Array  # (T, P, 1) critic on pre-step obs
    returns: jax.Array  # (T, P) normalized discounted returns
    done: jax.Array  # (T, P) bool


class RolloutMetrics(NamedTuple):
    mean_rew: jax.Array  # () mean of unnormalized returns
    stats: EpisodeStats  # episode endings during this rollout


class MAPPO(NamedTuple):
    """Bundle of pure MAPPO functions over fixed configs."""

    cfg: MAPPOConfig
    init: Callable  # rng -> (TrainState, EnvState)
    collect: Callable  # (TrainState, EnvState, rng) -> (EnvState, Buffer, RolloutMetrics)
    train_actor: Callable  # (TrainState, Buffer) -> (TrainState, losses)
    train_critic: Callable  # (TrainState, Buffer) -> (TrainState, losses)
    train_many: Callable  # (TrainState, EnvState, rng, n) -> (ts, es, metrics, losses)


def _sample_std(x: jax.Array) -> jax.Array:
    """Unbiased (N-1) std — torch.std_mean default (reference models.py:140)."""
    n = x.size
    mean = jnp.mean(x)
    return jnp.sqrt(jnp.sum((x - mean) ** 2) / (n - 1))


def discounted_returns(rewards: jax.Array, done: jax.Array, gamma: float):
    """Reverse-scan zero-at-done discounted returns
    (reference models.py:131-148).  rewards/done (T, P) -> returns (T, P)."""

    def body(curr, rd):
        rew, d = rd
        curr = jnp.where(d, 0.0, rew + gamma * curr)
        return curr, curr

    init = jnp.zeros(rewards.shape[1], rewards.dtype)
    _, rets = jax.lax.scan(body, init, (rewards, done), reverse=True)
    return rets


def reference_returns(rewards: jax.Array, done: jax.Array, cfg: MAPPOConfig):
    """Zero-at-done discounted returns + whole-buffer z-normalization
    (reference models.py:131-148).  Returns ``(normalized (T, P) f32,
    mean of unnormalized returns)``.

    With ``cfg.returns_f64`` the accumulation, mean and std all run in
    float64 — exactly the reference's ``dtype=float`` accumulator
    (reference models.py:133), whose f32↔f64 deviation compounds over
    buffer_len steps at reward magnitudes ~1e3.  Requires
    ``jax_enable_x64`` (used by the curve-parity harness,
    scripts/compare_reference.py); the result is cast back to f32 for the
    buffer."""
    if cfg.returns_f64:
        if not jax.config.jax_enable_x64:
            raise ValueError(
                "returns_f64 needs jax.config.update('jax_enable_x64', True) "
                "before use (float64 is silently downgraded otherwise)")
        rewards = rewards.astype(jnp.float64)
    rets = discounted_returns(rewards, done, cfg.gamma)
    mean_rew = jnp.mean(rets)
    normed = (rets - mean_rew) / (_sample_std(rets) + 1e-12)
    return normed.astype(jnp.float32), mean_rew


def gae_advantages(rewards, done, values, last_value, gamma, lam):
    """Bootstrapped GAE(lambda) — the corrected estimator behind
    ``use_gae`` (not present in the reference).  Shapes: rewards/done
    (T, P), values (T, P), last_value (P,)."""

    def body(carry, rdv):
        gae, next_value = carry
        rew, d, val = rdv
        not_done = 1.0 - d.astype(rew.dtype)
        delta = rew + gamma * next_value * not_done - val
        gae = delta + gamma * lam * not_done * gae
        return (gae, val), gae

    init = (jnp.zeros_like(last_value), last_value)
    _, adv = jax.lax.scan(body, init, (rewards, done, values), reverse=True)
    return adv


# ----------------------------------------------------------------------
# Associative-scan returns (round 5): the reverse recursions above are
# affine in the carry (c_t = a_t * c_{t+1} + b_t), so they admit an
# O(log T) associative suffix-combine instead of T sequential scan steps.
# At the reference-sized config (T=1000, P=1024) the sequential scan is
# pure latency (~5.2 ms, BASELINE.md round-2 composed decomposition) and
# dominates the post-kernel tail of the fused collect.  Same algebra,
# different fp ASSOCIATION — parity vs the sequential form is tested at
# reassociation tolerance (tests/test_mappo.py); the XLA/golden-parity
# paths keep the sequential scan, only the fused collect routes here
# (ops/fused_collect.py, MARLNAV_ASSOC_RETURNS).
# ----------------------------------------------------------------------

def _affine_suffix_scan(a: jax.Array, b: jax.Array) -> jax.Array:
    """c_t for c_t = a_t * c_{t+1} + b_t, c_T = 0, via associative_scan.

    Element t represents f_t(c) = a_t c + b_t; the suffix combine must
    produce F_t = f_t .. f_{T-1} with the EARLIER element outermost.
    Under reverse=True the left operand of the combine fn is the LATER
    composite (flip-scan-flip), so compose(u, v) applies u inside v:
    (a_v a_u, a_v b_u + b_v) — the operand order is pinned by the
    sequential-equality test, not convention."""

    def compose(u, v):
        au, bu = u
        av, bv = v
        return au * av, av * bu + bv

    _, rets = jax.lax.associative_scan(compose, (a, b), reverse=True, axis=0)
    return rets


def discounted_returns_assoc(rewards: jax.Array, done: jax.Array,
                             gamma: float):
    """``discounted_returns`` in O(log T) depth (same (T, P) -> (T, P))."""
    nd = 1.0 - done.astype(rewards.dtype)
    return _affine_suffix_scan(gamma * nd, rewards * nd)


def reference_returns_assoc(rewards: jax.Array, done: jax.Array,
                            cfg: MAPPOConfig):
    """``reference_returns`` with the associative returns pass (the f64
    accumulator path keeps the sequential scan: it exists only for the
    bit-level curve-parity harness)."""
    if cfg.returns_f64:
        return reference_returns(rewards, done, cfg)
    rets = discounted_returns_assoc(rewards, done, cfg.gamma)
    mean_rew = jnp.mean(rets)
    normed = (rets - mean_rew) / (_sample_std(rets) + 1e-12)
    return normed.astype(jnp.float32), mean_rew


def gae_advantages_assoc(rewards, done, values, last_value, gamma, lam):
    """``gae_advantages`` in O(log T) depth: delta_t is already
    vectorized; only the A_t = delta_t + gamma*lam*nd_t * A_{t+1}
    recursion needs the affine suffix scan."""
    nd = 1.0 - done.astype(rewards.dtype)
    values_next = jnp.concatenate([values[1:], last_value[None]], axis=0)
    delta = rewards + gamma * values_next * nd - values
    return _affine_suffix_scan(gamma * lam * nd, delta)


# ----------------------------------------------------------------------
# Losses (reference models.py:270-316) — module level for direct testing
# ----------------------------------------------------------------------

def _flatten_minibatch(mb: Buffer, cfg: MAPPOConfig):
    """Concatenate a (size, ...) minibatch along the step axis the way the
    reference's ``torch.cat(..., dim=0)`` does (reference models.py:272-277)."""
    size = mb.obs.shape[0]
    p, a = cfg.num_parallel, cfg.num_agents
    obs = mb.obs.reshape(size * p, a, cfg.obs_size)
    actions = mb.actions.reshape(size * p * a, cfg.action_size)
    log_probs = mb.log_probs.reshape(size * p * a)
    values = mb.values.reshape(size * p)
    returns = mb.returns.reshape(size * p)
    return obs, actions, log_probs, values, returns


def _pair_per_agent(x: jax.Array, cfg: MAPPOConfig) -> jax.Array:
    """Expand (size*P,) to (size*P*A,) to pair with per-agent log-probs.

    faithful: ``Tensor.repeat`` tiling (reference models.py:285-286) — the
    verified mis-pairing.  fixed: repeat-interleave, the correct
    (step, env, agent) pairing."""
    if cfg.faithful:
        return jnp.tile(x, cfg.num_agents)
    return jnp.repeat(x, cfg.num_agents)


def actor_loss(actor: ActorParams, mb: Buffer, cfg: MAPPOConfig) -> jax.Array:
    """Negated PPO-clip + entropy objective (the reference *maximizes* it
    with Adam maximize=True, reference models.py:71-72, 270-299)."""
    obs, actions, old_log_probs, values, returns = _flatten_minibatch(mb, cfg)
    dtype = jnp.bfloat16 if cfg.bf16_updates else None
    mean, var = actor_apply(actor, obs, compute_dtype=dtype)
    dist = DiagGaussian(mean, var)
    new_log_probs = dist.log_prob(actions)
    entropies = dist.entropy()

    advantages = _pair_per_agent(returns, cfg) - _pair_per_agent(values, cfg)
    ratios = jnp.exp(new_log_probs - old_log_probs)
    clip_obj = jnp.mean(
        jnp.minimum(
            ratios * advantages,
            jnp.clip(ratios, 1.0 - cfg.epsilon, 1.0 + cfg.epsilon) * advantages,
        )
    )
    return -(clip_obj + cfg.ent_const * jnp.mean(entropies))


def critic_loss(critic: CriticParams, mb: Buffer, cfg: MAPPOConfig) -> jax.Array:
    """Clipped-value loss (reference models.py:301-316)."""
    obs, _, _, values, returns = _flatten_minibatch(mb, cfg)
    dtype = jnp.bfloat16 if cfg.bf16_updates else None
    new_values = critic_apply(critic, obs, compute_dtype=dtype)[:, 0]
    diff = (new_values - returns) ** 2
    clamped = jnp.clip(new_values, values - cfg.epsilon, values + cfg.epsilon)
    clamped_diff = (clamped - returns) ** 2
    return jnp.mean(jnp.maximum(diff, clamped_diff))


def minibatch_slices(buffer: Buffer, cfg: MAPPOConfig):
    """Static contiguous time-slices per the reference's minibatching
    (reference models.py:165-172): full batches, plus — in faithful mode
    when the last batch reaches the buffer end — a tail batch with the
    final buffer step dropped."""
    slices = []
    bs = cfg.batch_size
    for j in range(cfg.num_minibatches):
        start = j * bs
        if cfg.faithful and start + bs >= cfg.buffer_len:
            size = cfg.buffer_len - 1 - start  # slice end == -1
        else:
            size = bs
        slices.append(
            jax.tree.map(lambda x: jax.lax.slice_in_dim(x, start, start + size), buffer)
        )
    return slices


def make_mappo(
    cfg: MAPPOConfig,
    env: Env,
    normalizer_cfg: NormalizerConfig,
    scaler_cfg: ScalerConfig,
    mesh=None,
    axis: str = "data",
) -> MAPPO:
    """Build the MAPPO function bundle.

    ``mesh`` only matters for ``cfg.fused_updates``: the update kernels are
    single-shard programs, so with a mesh each training phase shard_maps
    over ``axis`` (env batch sharded, params replicated) and the kernels'
    gradient sums are ``psum``-reduced before Adam — the same data-parallel
    update the XLA path gets from jit's automatic partitioning."""
    normalize = make_obs_normalizer(normalizer_cfg)
    scale_up = make_action_scaler(scaler_cfg)
    # torch Adam defaults (betas 0.9/0.999, eps 1e-8) == optax.adam defaults.
    actor_tx = optax.adam(cfg.lr)
    critic_tx = optax.adam(cfg.lr)
    p, a = cfg.num_parallel, cfg.num_agents

    def init(rng: jax.Array) -> Tuple[TrainState, EnvState]:
        k_actor, k_critic, k_env = jax.random.split(rng, 3)
        actor = actor_init(k_actor, cfg.obs_size, cfg.hidden_size, cfg.action_size)
        critic = critic_init(k_critic, cfg.obs_size, a, cfg.hidden_size)
        ts = TrainState(
            actor=actor,
            critic=critic,
            actor_opt=actor_tx.init(actor),
            critic_opt=critic_tx.init(critic),
        )
        return ts, env.init(k_env)

    # ------------------------------------------------------------------
    # Rollout (reference models.py:106-129 ``get_data``)
    # ------------------------------------------------------------------

    def collect(ts: TrainState, env_state: EnvState, rng: jax.Array):
        # Stats counters are harvested per rollout and reset
        # (reference models.py:151-158) — zero them at rollout start.
        env_state = env_state._replace(stats=EpisodeStats.zeros())
        obs0 = normalize(env.observations(env_state))

        def body(carry, _):
            env_state, obs, rng = carry
            rng, k = jax.random.split(rng)
            mean, var = actor_apply(ts.actor, obs)
            dist = DiagGaussian(mean, var)
            flat_actions = dist.sample(k)  # (P*A, 2) in ~[-1, 1]
            log_probs = dist.log_prob(flat_actions)  # (P*A,)
            actions = flat_actions.reshape(p, a, cfg.action_size)
            env_state, out = env.step(env_state, scale_up(actions))
            done = out.terminated | out.truncated
            values = critic_apply(ts.critic, obs)  # pre-step obs (P, 1)
            record = (obs, actions, log_probs, values, out.rewards, done)
            new_obs = normalize(out.obs)
            return (env_state, new_obs, rng), record

        (env_state, last_obs, _), (obs, actions, log_probs, values, rewards, done) = (
            jax.lax.scan(body, (env_state, obs0, rng), None, length=cfg.buffer_len)
        )

        # Returns processing (reference models.py:131-148): zero-at-done
        # discounted returns, then whole-buffer z-normalization.
        if cfg.use_gae:
            # Corrected estimator: bootstrapped GAE advantages stored as
            # "returns" = advantage + value (so advantage reconstruction in
            # the losses still reads returns - values).
            mean_rew = jnp.mean(discounted_returns(rewards, done, cfg.gamma))
            last_value = critic_apply(ts.critic, last_obs)[:, 0]
            adv = gae_advantages(
                rewards, done, values[..., 0], last_value, cfg.gamma, cfg.gae_lambda
            )
            rets = adv + values[..., 0]
        else:
            rets, mean_rew = reference_returns(rewards, done, cfg)

        buffer = Buffer(obs, actions, log_probs, values, rets, done)
        return env_state, buffer, RolloutMetrics(mean_rew, env_state.stats)

    # ------------------------------------------------------------------
    # Update loops (reference models.py:160-198)
    # ------------------------------------------------------------------

    # Fused-update kernels (ops/fused_update.py): forward + hand-derived
    # backward of each loss in one streaming Pallas pass, grads returned
    # for the SAME optax Adam — exact optimizer-semantics parity, and the
    # gradient psum still slots in under a mesh.  No PRNG is involved, so
    # interpret mode off-TPU is fully functional.
    if cfg.fused_updates:
        from marlnav_tpu.ops.fused_update import (
            make_fused_actor_grad,
            make_fused_critic_grad,
            stage_actor_minibatch,
            stage_critic_minibatch,
        )

        interpret = jax.devices()[0].platform != "tpu"
        psum_axis = axis if mesh is not None else None
        # The Mosaic interpreter's shared-memory simulator can deadlock
        # when many shard_map'd kernel instances run concurrently with
        # large packed-G buffers (observed: ACTOR_G=8 hangs on the
        # 8-virtual-device dryrun mesh — threads wedge in the
        # interpret_pallas_call _allocate_buffer io_callbacks — while
        # G<=2 and real-TPU runs are fine).  G is purely a performance
        # knob, so cap it when emulating under a mesh.
        from marlnav_tpu.ops import fused_update as _fu
        actor_g = critic_g = None  # module defaults (ACTOR_G / CRITIC_G)
        if interpret and mesh is not None:
            actor_g, critic_g = min(_fu.ACTOR_G, 2), min(_fu.CRITIC_G, 2)
        # Faithful advantage pairing under a mesh is a GLOBAL flat tile
        # over the env batch (reference models.py:285-286) — staging
        # all_gathers the tiny (size, P) returns - values inside the
        # shard_mapped phase and gathers each shard's own rows
        # (ops/fused_update._pair_rows_sharded).
        pair_axis = axis if (mesh is not None and cfg.faithful) else None
        actor_stage = lambda mb: stage_actor_minibatch(  # noqa: E731
            mb, cfg, g=actor_g, pair_axis=pair_axis)
        critic_stage = lambda mb: stage_critic_minibatch(  # noqa: E731
            mb, cfg, g=critic_g)
        actor_kernel = make_fused_actor_grad(cfg, interpret=interpret,
                                             psum_axis=psum_axis, g=actor_g)
        critic_kernel = make_fused_critic_grad(cfg, interpret=interpret,
                                               psum_axis=psum_axis,
                                               g=critic_g)
    else:
        actor_stage = critic_stage = actor_kernel = critic_kernel = None

    n_shards = 1 if mesh is None else mesh.shape[axis]

    def _train_phase(loss_fn, stage_fn, kernel_grad, tx, get_params, get_opt,
                     set_both):
        def phase(params, opt, buffer: Buffer):
            slices = minibatch_slices(buffer, cfg)
            # Group equally-sized minibatches so each group is a scan
            # (compiled once) over stacked slices; epochs are an outer scan.
            # Fused mode stages each slice into the kernel's feature-major
            # layout ONCE here — not per epoch.  Under shard_map this runs
            # per shard on the local buffer slice; kernel_grad psums the
            # sums, so n_rows must be the GLOBAL row count.
            by_size = {}
            for s in slices:
                by_size.setdefault(s.obs.shape[0], []).append(s)
            groups = []
            for group in by_size.values():
                if stage_fn is None:
                    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *group)
                    groups.append((stacked, None))
                else:
                    staged = [stage_fn(s) for s in group]
                    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                                           *[t for t, _ in staged])
                    groups.append((stacked, staged[0][1] * n_shards))

            def epoch(carry, _):
                params, opt = carry

                losses = []
                for g, n_rows in groups:
                    def mb_step(carry, mb, n_rows=n_rows):
                        params, opt = carry
                        if kernel_grad is None:
                            loss, grads = jax.value_and_grad(loss_fn)(
                                params, mb, cfg)
                        else:
                            loss, grads = kernel_grad(params, mb, n_rows)
                        updates, opt = tx.update(grads, opt, params)
                        params = optax.apply_updates(params, updates)
                        return (params, opt), loss

                    (params, opt), ls = jax.lax.scan(mb_step, (params, opt), g)
                    losses.append(ls)
                return (params, opt), jnp.concatenate(losses)

            (params, opt), losses = jax.lax.scan(
                epoch, (params, opt), None, length=cfg.num_epochs
            )
            return params, opt, losses.reshape(-1)

        if mesh is not None and kernel_grad is not None:
            from jax.sharding import PartitionSpec as P

            phase = jax.shard_map(
                phase,
                mesh=mesh,
                # Params/opt replicated; every Buffer leaf sharded over the
                # env axis (axis 1 of (T, P, ...) / the flattened (T, P*A)).
                in_specs=(P(), P(), Buffer(*([P(None, axis)] * 6))),
                out_specs=(P(), P(), P()),
                check_vma=False,  # pallas outs carry no vma metadata
            )

        def train(ts: TrainState, buffer: Buffer):
            params, opt, losses = phase(get_params(ts), get_opt(ts), buffer)
            return set_both(ts, params, opt), losses

        return train

    train_actor = _train_phase(
        actor_loss,
        actor_stage,
        actor_kernel,
        actor_tx,
        lambda ts: ts.actor,
        lambda ts: ts.actor_opt,
        lambda ts, pr, op: ts._replace(actor=pr, actor_opt=op),
    )
    train_critic = _train_phase(
        critic_loss,
        critic_stage,
        critic_kernel,
        critic_tx,
        lambda ts: ts.critic,
        lambda ts: ts.critic_opt,
        lambda ts, pr, op: ts._replace(critic=pr, critic_opt=op),
    )

    def train_many(ts: TrainState, env_state: EnvState, rng: jax.Array,
                   num_repeats: int):
        """``num_repeats`` full (collect -> train actor -> train critic)
        cycles as ONE device program (``lax.scan`` over repeats).

        The reference's outer repeat loop runs on the host
        (reference __main__.py:23-27); so does ours by default (train.py) —
        but on high-dispatch-latency links (remote TPU) host round trips
        between the three phases dominate wall-clock, and this collapses a
        whole block of repeats into a single dispatch.  Per-repeat metrics
        and losses come back stacked, so logging fidelity is unchanged.
        ``num_repeats`` is static (jit with static_argnums=3).
        """

        def body(carry, repeat):
            ts, env_state = carry
            r_rng = jax.random.fold_in(rng, repeat)
            env_state, buffer, metrics = collect(ts, env_state, r_rng)
            ts, actor_losses = train_actor(ts, buffer)
            ts, critic_losses = train_critic(ts, buffer)
            return (ts, env_state), (metrics, actor_losses, critic_losses)

        (ts, env_state), (metrics, actor_losses, critic_losses) = jax.lax.scan(
            body, (ts, env_state), jnp.arange(num_repeats), length=num_repeats
        )
        return ts, env_state, metrics, actor_losses, critic_losses

    return MAPPO(cfg, init, collect, train_actor, train_critic, train_many)
