"""Shared in-kernel step math for the fused Pallas rollout kernels.

Factored out of fused_rollout.py so the bench kernel (rewards only) and
the collect kernel (full training buffer) orchestrate the SAME physics:
observation geometry, actor MLP + Gaussian sampling, dynamics, rewards/
terminations, and the auto-reset draw.  Everything here operates on
(8, 128) env tiles (see fused_rollout.py layout notes) and replicates
marlnav_tpu.env semantics op-for-op (which replicate the reference,
reference environment.py:92-269); deviations are documented in
fused_rollout.py's module docstring.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

_NORMALIZE_EPS = 1e-12
_ACOS_CLAMP = 1e-8
_TWO_PI = 2.0 * math.pi

SUB, LANE = 8, 128
TILE = (SUB, LANE)
BLOCK_ENVS = SUB * LANE  # 1024 envs per grid step, one full VPU tile


def acos(x):
    """arccos for x in [-1, 1] — Mosaic has no acos/atan2 lowering, so use
    the Hastings polynomial (Abramowitz & Stegun 4.4.45), |err| <= 2e-8:
    f32-exact for this workload."""
    ax = jnp.abs(x)
    poly = jnp.float32(-0.0012624911)
    for c in (0.0066700901, -0.0170881256, 0.0308918810, -0.0501743046,
              0.0889789874, -0.2145988016, 1.5707963050):
        poly = poly * ax + jnp.float32(c)
    r = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * poly
    return jnp.where(x < 0.0, math.pi - r, r)


# Bounded-range sin/cos (round 5).  The roofline microbench
# (scripts/roofline.py, docs/roofline_r5.json) measured jnp.cos/sin on
# this chip at ~67 ps/element — ~130x an fma — because the generic
# lowering pays full argument-range reduction.  Every angle in these
# kernels is RANGE-BOUNDED (steering angles are clipped to [-pi, pi],
# Box-Muller theta is 2*pi*u with u in [0,1), reset headings are
# angle_range*(u-0.5)), so degree-13 odd / degree-12 even least-squares
# polynomials on [-pi, pi] suffice: |err| <= 6.1e-7 in f32 Horner
# evaluation (the f32 rounding floor; double-precision fit error is
# 1.3e-9/1.1e-8).  8/7 tile-FMAs instead of ~130-op lowerings removed
# ~0.7 ns/env-step from the kernels' measured ~1.5 ns marginal cost.
_SIN_C = (0.99999999442030307, -0.16666664568359335,
          0.0083333102899997395, -0.00019840151841299232,
          2.752939488670167e-06, -2.4676487851666484e-08,
          1.3449973826791738e-10)
_COS_C = (0.99999998904852216, -0.49999989101180597,
          0.041666489213904624, -0.0013887803571303186,
          2.4769882914249208e-05, -2.7079024321864158e-07,
          1.7245068538391953e-09)


def sin_pi(x):
    """sin(x) for |x| <= pi (+ a few f32 ulp of slack at the ends)."""
    x2 = x * x
    acc = jnp.float32(_SIN_C[-1])
    for c in _SIN_C[-2::-1]:
        acc = acc * x2 + jnp.float32(c)
    return acc * x


def cos_pi(x):
    """cos(x) for |x| <= pi (+ a few f32 ulp of slack at the ends)."""
    x2 = x * x
    acc = jnp.float32(_COS_C[-1])
    for c in _COS_C[-2::-1]:
        acc = acc * x2 + jnp.float32(c)
    return acc


def bits_to_uniform(bits):
    """Uniform [0, 1) from raw 32-bit PRNG output (int32).

    Uses the top 24 bits so every value is exactly representable in
    float32 and the result is strictly < 1.0 (a naive bits*2^-32+0.5
    rounds up to exactly 1.0 for bits near 2^31, escaping the [0,1)
    contract ~2^-25 of the time)."""
    return ((bits >> 8).astype(jnp.float32) * (1.0 / 16777216.0)) + 0.5


def box_muller(u1, u2):
    """(z0, z1) standard-normal pair from two uniforms.

    theta = 2*pi*u2 is mapped to t = theta - pi in [-pi, pi) so the
    bounded polynomials apply: cos(theta) = -cos_pi(t),
    sin(theta) = -sin_pi(t) — the negation folds into r."""
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
    t = _TWO_PI * u2 - math.pi
    rn = -r
    return rn * cos_pi(t), rn * sin_pi(t)


def uniform01(shape):
    """Uniform [0, 1) from the in-kernel PRNG."""
    return bits_to_uniform(pltpu.prng_random_bits(shape))


class StepMath:
    """Step physics closures over the static configs.

    Built once per kernel factory; every method maps (8,128) tiles to
    (8,128) tiles with unrolled agent/obstacle loops.
    """

    def __init__(self, env_params, init_cfg, normalizer_cfg, scaler_cfg):
        p = env_params
        self.p = p
        self.a, self.o = p.num_agents, p.num_obstacles
        if self.a != 3:
            raise NotImplementedError(
                "fused kernels cover the triangle scenario family (3 "
                "agents); mock/diagnostic scenarios use the XLA path")
        self.init_cfg = init_cfg
        self.obs_size = p.obs_size
        self.n_rows = 5 * self.a + 2 * self.o + 4
        # Reset draw budget: 2 uniforms per obstacle, plus — with noisy_ags
        # (reference utils.py:370-388) — 3 per agent (a Box-Muller pair for
        # the position noise + 1 for the heading angle).
        self.noisy = bool(init_cfg.noisy_ags)
        self.n_reset_draws = 2 * self.o + (3 * self.a if self.noisy else 0)
        self.n_draws = 2 * self.a + self.n_reset_draws
        self.pos_std = init_cfg.ags_dist * math.sqrt(init_cfg.ags_std)
        self.angle_range = init_cfg.angle_range

        # Triangle-init constants (env/initializers.py).
        pos_const = 0.5 * init_cfg.ags_dist
        r3 = math.sqrt(3.0)
        self.base_x = tuple(init_cfg.ags_cent_x + pos_const * v
                            for v in (-1.0 / r3, 2.0 / r3, -1.0 / r3))
        self.base_y = tuple(init_cfg.ags_cent_y + pos_const * v
                            for v in (1.0, 0.0, -1.0))
        self.ox_range = init_cfg.obst_max_x - init_cfg.obst_min_x
        self.oy_range = init_cfg.obst_max_y - init_cfg.obst_min_y
        self.ox_mean = 0.5 * (init_cfg.obst_min_x + init_cfg.obst_max_x)
        self.oy_mean = 0.5 * (init_cfg.obst_min_y + init_cfg.obst_max_y)

        # Normalizer feature scales (utils/transforms.py).
        max_dist = math.hypot(normalizer_cfg.max_x_value,
                              normalizer_cfg.max_y_value)
        self.inv_pi = 1.0 / math.pi
        self.d_scale = 2.0 / max_dist  # x * d_scale - 1

        # Action scaler: raw [-1,1] -> [angle, accel] physical.
        (amin, cmin), (amax, cmax) = scaler_cfg.bounds()
        self.ang_mean, self.ang_scale = 0.5 * (amin + amax), 0.5 * (amax - amin)
        self.acc_mean, self.acc_scale = 0.5 * (cmin + cmax), 0.5 * (cmax - cmin)
        self.cos_head = math.cos(p.max_angle_diff)

        # Scratch row offsets (see fused_rollout.py RowState).
        a = self.a
        self.PX, self.PY, self.DX, self.DY, self.SP = (
            0, a, 2 * a, 3 * a, 4 * a)
        self.OBX, self.OBY = 5 * a, 5 * a + self.o
        self.TG = 5 * a + 2 * self.o
        self.SN, self.LAT = self.TG + 2, self.TG + 3

    # ------------------------------------------------------------------
    def geom(self, px_a, py_a, hx_a, hy_a, tx, ty):
        """Angle + distance tiles (env/geometry.py angles_and_distances)."""
        ddx = tx - px_a
        ddy = ty - py_a
        dist = jnp.sqrt(ddx * ddx + ddy * ddy)
        inv = 1.0 / jnp.maximum(dist, _NORMALIZE_EPS)
        ux = ddx * inv
        uy = ddy * inv
        dot = jnp.clip(hx_a * ux + hy_a * uy, -1.0 + _ACOS_CLAMP,
                       1.0 - _ACOS_CLAMP)
        orth_x = ux - dot * hx_a
        sign = jnp.where(orth_x > 0.0, -1.0, 1.0)
        ang = sign * acos(dot)
        ang = jnp.where(dist < self.p.cap_distance, 0.0, ang)
        return ang, dist

    def obs_feats(self, px, py, hx, hy, obx, oby, tx, ty):
        """Normalized per-agent observation feature tiles —
        [agent][feature] in the env/types.py Observations concat order."""
        feats_all = []
        for i in range(self.a):
            t_ang, t_dist = self.geom(px[i], py[i], hx[i], hy[i], tx, ty)
            feats = [t_ang * self.inv_pi, t_dist * self.d_scale - 1.0]
            o_ang, o_dist = [], []
            for j in range(self.o):
                oa, od = self.geom(px[i], py[i], hx[i], hy[i], obx[j], oby[j])
                o_ang.append(oa * self.inv_pi)
                o_dist.append(od * self.d_scale - 1.0)
            n_ang, n_dist = [], []
            for j in range(self.a):
                if j == i:
                    continue
                na, nd = self.geom(px[i], py[i], hx[i], hy[i], px[j], py[j])
                n_ang.append(na * self.inv_pi)
                n_dist.append(nd * self.d_scale - 1.0)
            feats_all.append(feats + o_ang + o_dist + n_ang + n_dist)
        return feats_all

    def actor_affine(self, feats, wa, ca, want_var: bool):
        """One agent's actor forward via the precomposed affine operator.

        The reference actor applies NO hidden activation (reference
        models.py:29), so obs -> head preactivations is affine:
        z = A x + c with A = [(W1 Wmu)^T; (W1 Wvar)^T] (4, obs) and
        c = [b1 Wmu + bmu; b1 Wvar + bvar] — the same collapse that made
        the affine UPDATE kernel 4.4x (ops/fused_update._affine_compose,
        composed at HIGHEST matmul precision so the operator is f32-exact).
        Replaces the chained 12->H->4 scalar-FMA walk (~800 tile-FMAs per
        agent per step at H=50) with 48 FMAs + the same transcendentals;
        weight scalars are read from SMEM refs inside the loop body.
        Returns (mu[2], var[2] or None)."""
        k_rows = 4 if want_var else 2
        z = [
            sum((wa[k, f] * feats[f] for f in range(1, self.obs_size)),
                wa[k, 0] * feats[0]) + ca[k, 0]
            for k in range(k_rows)
        ]
        mu = [jnp.tanh(z[0]), jnp.tanh(z[1])]
        if not want_var:
            return mu, None
        return mu, [jax.nn.softplus(z[2]), jax.nn.softplus(z[3])]

    def dynamics(self, px, py, hx, hy, sp, ang_raw, acc_raw):
        """Action scaling + clamped integrator (env/dynamics.py)."""
        p = self.p
        npx, npy, nhx, nhy, nsp = [], [], [], [], []
        for i in range(self.a):
            ang = jnp.clip(self.ang_mean + self.ang_scale * ang_raw[i],
                           -math.pi, math.pi)
            acc = jnp.clip(self.acc_mean + self.acc_scale * acc_raw[i],
                           p.min_accel, p.max_accel)
            c, s = cos_pi(ang), sin_pi(ang)  # post-clip: |ang| <= pi
            nhx.append(c * hx[i] - s * hy[i])
            nhy.append(s * hx[i] + c * hy[i])
            nsp.append(jnp.clip(sp[i] + acc, p.min_speed, p.max_speed))
            npx.append(px[i] + nhx[i] * nsp[i])
            npy.append(py[i] + nhy[i] * nsp[i])
        return npx, npy, nhx, nhy, nsp

    def rewards(self, npx, npy, nhx, nhy, obx, oby, tx, ty,
                px=None, py=None):
        """(reward, all_in_target, any_coll) tiles from the moved,
        pre-reinit state (env/reward.py).  Angle tests use dot thresholds
        (exactly equivalent, acos is monotone) with the env's zeroed-angle-
        inside-cap_distance quirk special-cased.  ``px``/``py`` are the
        PRE-move positions, consumed only when ``group_soft_factor`` is
        set (the potential-based shaping's phi(s) input)."""
        p = self.p
        reward_sum = jnp.zeros(TILE, jnp.float32)
        all_in_target = jnp.ones(TILE, jnp.float32)
        any_coll = jnp.zeros(TILE, jnp.float32)
        max_t_dist = jnp.zeros(TILE, jnp.float32)
        prev_max_t_dist = jnp.zeros(TILE, jnp.float32)
        for i in range(self.a):
            ddx, ddy = tx - npx[i], ty - npy[i]
            t_dist = jnp.sqrt(ddx * ddx + ddy * ddy)
            max_t_dist = jnp.maximum(max_t_dist, t_dist)
            if p.group_soft_factor:
                pdx, pdy = tx - px[i], ty - py[i]
                prev_max_t_dist = jnp.maximum(
                    prev_max_t_dist, jnp.sqrt(pdx * pdx + pdy * pdy))
            inv = 1.0 / jnp.maximum(t_dist, _NORMALIZE_EPS)
            t_dot = jnp.clip((nhx[i] * ddx + nhy[i] * ddy) * inv,
                             -1.0 + _ACOS_CLAMP, 1.0 - _ACOS_CLAMP)

            o_risk = jnp.zeros(TILE, jnp.float32)
            o_coll = jnp.zeros(TILE, jnp.float32)
            for j in range(self.o):
                odx, ody = obx[j] - npx[i], oby[j] - npy[i]
                o_dist = jnp.sqrt(odx * odx + ody * ody)
                o_risk = jnp.maximum(
                    o_risk, jnp.where(o_dist < p.ob_risk_dist, 1.0, 0.0))
                o_coll = jnp.maximum(
                    o_coll, jnp.where(o_dist < p.ob_coll_dist, 1.0, 0.0))

            n_risk = jnp.zeros(TILE, jnp.float32)
            n_coll = jnp.zeros(TILE, jnp.float32)
            band_sum = jnp.zeros(TILE, jnp.float32)
            bond_sum = jnp.zeros(TILE, jnp.float32)
            for j in range(self.a):
                if j == i:
                    continue
                ndx_, ndy_ = npx[j] - npx[i], npy[j] - npy[i]
                n_dist = jnp.sqrt(ndx_ * ndx_ + ndy_ * ndy_)
                n_risk = jnp.maximum(
                    n_risk, jnp.where(n_dist < p.ag_risk_dist, 1.0, 0.0))
                n_coll = jnp.maximum(
                    n_coll, jnp.where(n_dist < p.ag_coll_dist, 1.0, 0.0))
                band_sum = band_sum + jnp.where(
                    (p.agents_min_d < n_dist) & (n_dist < p.agents_max_d),
                    1.0, 0.0)
                scaled = (n_dist - p.ideal_dist) / p.bond_sharpness
                bond_sum = bond_sum + 1.0 / (1.0 + scaled * scaled)

            in_target = jnp.where(t_dist < p.target_radius, 1.0, 0.0)
            heading = jnp.where(
                t_dist < p.cap_distance, 1.0,
                jnp.where(t_dot > self.cos_head, 1.0, 0.0))
            soft = -t_dist / p.init_dist
            dist_sc = (jnp.minimum(band_sum, p.max_at_prop_d)
                       / p.max_at_prop_d)
            bond = bond_sum / float(self.a - 1)
            risk = jnp.minimum(o_risk + n_risk, 1.0)
            coll = jnp.minimum(o_coll + n_coll, 1.0)

            all_in_target = jnp.minimum(all_in_target, in_target)
            any_coll = jnp.maximum(any_coll, coll)
            # Per-agent reward WITHOUT the group target term (it needs the
            # min over agents; added after the loop).
            reward_sum = reward_sum + (
                p.heading_factor * heading
                + p.distance_factor * dist_sc
                + p.soft_factor * soft
                + p.bond_factor * bond
                - p.risk_factor * risk
            )

        # Group target bonus broadcasts to every agent, so its mean
        # contribution is just target_factor * all_in_target; likewise the
        # potential-based group-convergence shaping (env/reward.py
        # group_soft_factor branch — see the suicide-basin rationale
        # there; default off).
        reward = reward_sum / float(self.a) + p.target_factor * all_in_target
        if p.group_soft_factor:
            reward = reward + (p.group_soft_factor / p.init_dist) * (
                prev_max_t_dist - max_t_dist)
        return reward, all_in_target, any_coll

    def reset_blend(self, st, m, km, npx, npy, nhx, nhy, nsp, obx, oby,
                    step_num, new_latch, u):
        """Auto-reset: fresh triangle draw from raw uniforms ``u``
    (``n_reset_draws`` tiles in [0, 1)), mask-blended into the state
        scratch (env/env.py step reinit; noisy_ags per
        env/initializers.py <- reference utils.py:370-388)."""
        for j in range(self.o):
            st[self.OBX + j] = (m * ((u[j] - 0.5) * self.ox_range
                                     + self.ox_mean) + km * obx[j])
            st[self.OBY + j] = (m * ((u[self.o + j] - 0.5) * self.oy_range
                                     + self.oy_mean) + km * oby[j])
        k = 2 * self.o
        for i in range(self.a):
            if self.noisy:
                # Gaussian position noise (std ags_dist*sqrt(ags_std) per
                # coordinate: the reference parameterizes the COVARIANCE
                # diagonal) + uniform heading rotation of (1, 0).
                z0, z1 = box_muller(u[k + 3 * i], u[k + 3 * i + 1])
                ang = self.angle_range * (u[k + 3 * i + 2] - 0.5)
                bx = self.base_x[i] + self.pos_std * z0
                by = self.base_y[i] + self.pos_std * z1
                if self.angle_range <= _TWO_PI:
                    hx0, hy0 = cos_pi(ang), sin_pi(ang)  # |ang| <= pi
                else:  # diagnostic configs with wider ranges
                    hx0, hy0 = jnp.cos(ang), jnp.sin(ang)
                st[self.DY + i] = m * hy0 + km * nhy[i]
            else:
                bx, by, hx0 = self.base_x[i], self.base_y[i], 1.0
                st[self.DY + i] = km * nhy[i]
            st[self.PX + i] = m * bx + km * npx[i]
            st[self.PY + i] = m * by + km * npy[i]
            st[self.DX + i] = m * hx0 + km * nhx[i]
            st[self.SP + i] = m * self.init_cfg.init_speed + km * nsp[i]
        # Target is constant under the triangle init; leave as-is.
        st[self.SN] = km * step_num
        st[self.LAT] = new_latch
