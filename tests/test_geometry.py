"""Unit tests for the pure-jnp geometry kernels against hand-computed NumPy
(the reference formulas re-derived independently per SURVEY §7 stage 1)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from rvo3d_tpu.env import geometry as geo


def test_wraptopi():
    assert float(geo.wraptopi(jnp.array(4.0))) == pytest.approx(4.0 - 2 * math.pi)
    assert float(geo.wraptopi(jnp.array(-4.0))) == pytest.approx(-4.0 + 2 * math.pi)
    assert float(geo.wraptopi(jnp.array(1.0))) == pytest.approx(1.0)


def test_cone_alpha_matches_asin():
    dis, r_sum = 5.0, 0.4
    expect = round(math.asin(r_sum / dis), 2)
    got = float(geo.cone_alpha(jnp.array(dis), jnp.array(r_sum)))
    assert got == pytest.approx(expect, abs=1e-6)


def test_reciprocal_apex_priority_weighting():
    pa = jnp.array([1.0, 2.0, 3.0])
    va = jnp.array([0.5, 0.0, -0.5])
    vb = jnp.array([-0.5, 1.0, 0.0])
    paa = geo.reciprocal_apex(pa, jnp.array(5.0), jnp.array(5.0), va, vb)
    # pr = 0.5 -> PAA = 0.5*(2*pa + va+vb)
    expect = 0.5 * (2 * np.array(pa) + np.array(va) + np.array(vb))
    np.testing.assert_allclose(np.asarray(paa), expect, rtol=1e-6)


def test_vo_expected_time_branches():
    r_sum = 0.4
    # overlapping -> 0
    t = geo.vo_expected_time(jnp.array([0.1, 0.0, 0.0]),
                             jnp.array([1.0, 0.0, 0.0]), r_sum)
    assert float(t) == 0.0
    # closing: rel_p = p_b - p_a = (2,0,0); rel_v_origin is A's velocity
    # relative to B, so +x means A approaches B -> t = 2 - 0.4 = 1.6
    t = geo.vo_expected_time(jnp.array([2.0, 0.0, 0.0]),
                             jnp.array([1.0, 0.0, 0.0]), r_sum)
    assert float(t) == pytest.approx(1.6, abs=1e-6)
    # receding -> both roots negative -> -1
    t = geo.vo_expected_time(jnp.array([2.0, 0.0, 0.0]),
                             jnp.array([-1.0, 0.0, 0.0]), r_sum)
    assert float(t) == -1.0
    # parallel, never meet -> inf
    t = geo.vo_expected_time(jnp.array([2.0, 5.0, 0.0]),
                             jnp.array([-1.0, 0.0, 0.0]), r_sum)
    assert math.isinf(float(t))


def test_point_line_deviation_unclamped():
    start = jnp.array([0.0, 0.0, 0.0])
    end = jnp.array([1.0, 0.0, 0.0])
    # beyond the segment end: point-to-LINE gives perpendicular distance only
    p = jnp.array([5.0, 2.0, 0.0])
    assert float(geo.point_line_deviation(start, end, p)) == pytest.approx(2.0)
    # degenerate segment -> 0
    assert float(geo.point_line_deviation(start, start, p)) == 0.0


def test_desired_velocity_round_and_threshold():
    pos = jnp.array([0.0, 0.0, 0.0])
    des = jnp.array([3.0, 4.0, 0.0])
    v = geo.desired_velocity(pos, des, jnp.ones(3), 0.4)
    np.testing.assert_allclose(np.asarray(v), [0.6, 0.8, 0.0], atol=1e-7)
    # inside threshold -> zeros
    v0 = geo.desired_velocity(pos, jnp.array([0.1, 0.0, 0.0]), jnp.ones(3), 0.4)
    np.testing.assert_array_equal(np.asarray(v0), np.zeros(3))


def test_kinematic_step_matches_reference_equations():
    vel = jnp.array([[1.0, 0.0, 0.0]])
    yaw = jnp.array([0.0])
    pitch = jnp.array([0.0])
    act = jnp.array([[0.5, 0.5, 0.0]])  # +0.5 speed, +45deg yaw
    new_vel, new_yaw, new_pitch, speed = geo.kinematic_step(
        vel, yaw, pitch, act, 1.0, 90.0
    )
    assert float(speed[0]) == pytest.approx(1.5)
    assert float(new_yaw[0]) == pytest.approx(45.0)
    np.testing.assert_allclose(
        np.asarray(new_vel[0]),
        [1.5 * math.cos(math.radians(45)), 1.5 * math.sin(math.radians(45)), 0.0],
        atol=1e-6,
    )
    # speed floor at zero
    act2 = jnp.array([[-5.0, 0.0, 0.0]])
    _, _, _, speed2 = geo.kinematic_step(vel, yaw, pitch, act2, 1.0, 90.0)
    assert float(speed2[0]) == 0.0


def test_kinematic_yaw_wraps_and_pitch_clamps():
    vel = jnp.array([[0.0, 0.0, 0.0]])
    new_vel, yaw, pitch, _ = geo.kinematic_step(
        vel, jnp.array([350.0]), jnp.array([85.0]),
        jnp.array([[0.0, 0.5, 0.5]]), 1.0, 90.0,
    )
    assert float(yaw[0]) == pytest.approx(35.0)
    assert float(pitch[0]) == pytest.approx(90.0)


def test_kinematic_variant_max_acc10():
    """The standalone kinematic.py model variant (reference:
    uaisa_env/drone_envs/kinematic.py:3-74 — dead upstream, max_acc=10
    vs drone.py:72's 1.0) is one EnvParams preset here. Parity: an
    independent NumPy transliteration of kinematic.step's equations at
    max_acc=10 must match geo.kinematic_step under the preset, over random
    states/actions and across persisted yaw/pitch trajectories."""
    from rvo3d_tpu.config import kinematic_variant_params

    p = kinematic_variant_params()
    assert p.max_acc == 10.0 and p.max_angle_change == 90.0

    def np_variant_step(speed, yaw, pitch, action):
        # kinematic.py:19-31 (_action_to_control), :33-36 (_update_velocity
        # with dt=1 and speed floor 0), :38-44 (_update_angles), :46-54
        # (_get_velocity_components)
        acc_d = np.clip(action[0] * 10.0, -10.0, 10.0)
        yaw_d = np.clip(action[1] * 90.0, -90.0, 90.0)
        pitch_d = np.clip(action[2] * 90.0, -90.0, 90.0)
        new_speed = max(speed + acc_d * 1, 0)
        new_yaw = (yaw + yaw_d) % 360
        new_pitch = np.clip(pitch + pitch_d, -90, 90)
        yr, pr = np.deg2rad(new_yaw), np.deg2rad(new_pitch)
        v = np.array([new_speed * np.cos(pr) * np.cos(yr),
                      new_speed * np.cos(pr) * np.sin(yr),
                      new_speed * np.sin(pr)])
        return v, new_yaw, new_pitch, new_speed

    rng = np.random.default_rng(5)
    yaw, pitch = 10.0, -20.0
    vel = np.array([0.3, -0.2, 0.1])
    for _ in range(12):
        act = rng.uniform(-1, 1, 3)
        exp_vel, exp_yaw, exp_pitch, exp_speed = np_variant_step(
            float(np.linalg.norm(vel)), yaw, pitch, act)
        got_vel, got_yaw, got_pitch, got_speed = geo.kinematic_step(
            jnp.asarray(vel), jnp.asarray(yaw), jnp.asarray(pitch),
            jnp.asarray(act), p.max_acc, p.max_angle_change)
        # float32 device math vs float64 NumPy: 1e-4-level agreement
        np.testing.assert_allclose(np.asarray(got_vel), exp_vel, atol=1e-4)
        assert float(got_yaw) == pytest.approx(exp_yaw, abs=1e-4)
        assert float(got_pitch) == pytest.approx(exp_pitch, abs=1e-4)
        assert float(got_speed) == pytest.approx(exp_speed, abs=1e-4)
        vel, yaw, pitch = exp_vel, exp_yaw, exp_pitch


def test_angle_between_eps_zero_vector_rules():
    z = jnp.zeros(3)
    a = jnp.array([1.0, 0.0, 0.0])
    # true zero vs nonzero -> sqrt(1e-8)=1e-4 magnitude is NOT below 1e-6,
    # so the angle comes from cos ~ 0 -> pi/2 (the reference's actual quirk)
    ang = float(geo.angle_between_eps(z, a))
    assert ang == pytest.approx(math.pi / 2, abs=1e-3)


def test_deviation_penalty_shape():
    # far from route -> approaches -3; on route -> near 0
    assert float(geo.deviation_penalty(jnp.array(5.0))) == pytest.approx(-3.0, abs=1e-6)
    assert abs(float(geo.deviation_penalty(jnp.array(0.0)))) < 1e-6


def test_out_of_map():
    ms = jnp.array([10.0, 10.0, 5.0])
    assert not bool(geo.out_of_map(jnp.array([5.0, 5.0, 2.0]), ms))
    assert bool(geo.out_of_map(jnp.array([-0.1, 5.0, 2.0]), ms))
    assert bool(geo.out_of_map(jnp.array([5.0, 5.0, 5.1]), ms))


def test_polyline_length_padded():
    wps = jnp.array([[0.0, 0, 0], [1, 0, 0], [1, 1, 0], [1, 1, 0]])
    # n_points=3 -> length 2 regardless of padding
    assert float(geo.polyline_length(wps, 3)) == pytest.approx(2.0)


def test_osc_reward_matches_reference_transliteration():
    """osc_reward vs a NumPy transliteration of ir_gym.osc_reward
    (ir_gym.py:313-332 with the shadowing angle fn :447-473)."""
    import numpy as np
    import jax.numpy as jnp
    from math import sqrt, acos, pi
    from rvo3d_tpu.env.reward import osc_reward

    def ref_angle(A, B):
        eps = 1e-8
        mag_A = sqrt(A[0]**2 + A[1]**2 + A[2]**2 + eps)
        mag_B = sqrt(B[0]**2 + B[1]**2 + B[2]**2 + eps)
        dot = A[0]*B[0] + A[1]*B[1] + A[2]*B[2]
        if mag_A < 1e-6 or mag_B < 1e-6:
            return 0.0
        return acos(np.clip(dot / (mag_A * mag_B), -1.0 + eps, 1.0 - eps))

    def ref_wraptopi(t):
        if t > pi:
            t -= 2 * pi
        if t < -pi:
            t += 2 * pi
        return t

    def ref_osc(vels):
        if len(vels) < 3:
            return 0
        dif = []
        for i in range(1, len(vels) - 1):
            a1 = ref_angle(vels[i + 1], vels[i])
            a2 = ref_angle(vels[i], vels[i - 1])
            dif.append(round(ref_wraptopi(a1 - a2), 2))
        for j in range(len(dif) - 3):
            if (dif[j] > 0 and dif[j+1] < 0 and dif[j+2] > 0) or \
               (dif[j] < 0 and dif[j+1] > 0 and dif[j+2] < 0):
                return -10
        return 0

    rng = np.random.default_rng(3)
    # random trajectories + a hand-built oscillator + a straight cruiser
    trajs = [rng.standard_normal((T, 3)) for T in (2, 3, 5, 8, 12) for _ in range(8)]
    osc = np.array([[np.cos(0.8 * t * (-1) ** t), np.sin(0.8 * t * (-1) ** t), 0.0]
                    for t in range(10)])
    straight = np.tile(np.array([1.0, 0.0, 0.0]), (10, 1))
    trajs += [osc, straight, np.zeros((10, 3))]

    by_len = {}
    for tr in trajs:
        by_len.setdefault(len(tr), []).append(tr)
    saw_penalty = False
    for T, group in by_len.items():
        batch = np.stack(group, axis=1)                      # [T, N, 3]
        got = np.asarray(osc_reward(jnp.asarray(batch)))
        want = np.array([ref_osc(list(tr)) for tr in group], dtype=got.dtype)
        np.testing.assert_array_equal(got, want)
        saw_penalty |= bool((want == -10).any())
    assert saw_penalty, "fixture never triggered the oscillation branch"


def test_wp_select_matches_take_along_axis():
    """env/state.py:_wp_select is the gather-free waypoint selection (the
    axon TPU backend miscompiles small gathers — scripts/tpu_crosscheck.py);
    its one-hot broadcast-sum must equal take_along_axis semantics for
    unbatched [N, W, 3] and batched [E, N, W, 3] layouts."""
    import jax.numpy as jnp

    from rvo3d_tpu.env.state import _wp_select

    rng = np.random.default_rng(0)
    wps = jnp.asarray(rng.normal(size=(5, 7, 3)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 7, size=(5,)).astype(np.int32))
    want = np.take_along_axis(np.asarray(wps),
                              np.asarray(idx)[:, None, None], axis=1)[:, 0, :]
    np.testing.assert_array_equal(np.asarray(_wp_select(wps, idx)), want)

    wps_b = jnp.asarray(rng.normal(size=(4, 5, 7, 3)).astype(np.float32))
    idx_b = jnp.asarray(rng.integers(0, 7, size=(4, 5)).astype(np.int32))
    want_b = np.take_along_axis(
        np.asarray(wps_b), np.asarray(idx_b)[..., None, None], axis=2
    )[..., 0, :]
    np.testing.assert_array_equal(np.asarray(_wp_select(wps_b, idx_b)), want_b)


def test_one_hot_selection_finiteness():
    """The gather-free one-hot selections (env/rvo.py top-nm, _wp_select)
    are exact only while every entry of the gathered table is finite: a
    0*inf from any non-selected column would contaminate every selected
    row. This pins the precondition: pairwise_vo's obs9 (and its sort
    keys) must be finite for ALL pair branches — collision, back-off,
    normal-flagged, normal-unflagged (inf exp_time is mapped through
    input_exp_time = 1/(t+0.2)), self-pairs and out-of-range pairs
    (ADVICE r3: make the invariant explicit)."""
    import jax.numpy as jnp

    from rvo3d_tpu.config import EnvParams
    from rvo3d_tpu.env.rvo import pairwise_vo

    p = EnvParams(num_drones=4)
    # hand-placed states covering every branch:
    #  0-1 colliding (dis < r_sum), 0-2 receding (back-off), 0-3 head-on
    #  (normal flagged), plus a far pair (> drone_range, masked invalid)
    states = np.zeros((5, 12), np.float32)
    states[:, 6] = 0.2   # radius
    states[:, 7] = 5.0   # priority
    states[0, 0:3] = [0.0, 0.0, 1.0]
    states[0, 3:6] = [1.0, 0.0, 0.0]
    states[1, 0:3] = [0.3, 0.0, 1.0]      # colliding with 0
    states[2, 0:3] = [-2.0, 0.0, 1.0]     # behind 0, receding
    states[2, 3:6] = [-1.0, 0.0, 0.0]
    states[3, 0:3] = [2.5, 0.0, 1.0]      # head-on approach
    states[3, 3:6] = [-1.0, 0.0, 0.0]
    states[4, 0:3] = [100.0, 100.0, 1.0]  # out of range
    actions = np.asarray(states[:, 3:6])

    pw = pairwise_vo(jnp.asarray(states), jnp.asarray(actions), p)
    assert bool(jnp.any(pw.collision)), "fixture lost the collision branch"
    assert bool(jnp.any(pw.vo_flag)), "fixture lost the flagged branch"
    # obs9 is the table the one-hot selection multiplies into — it must be
    # finite in every slot, selected or not. (sort_t/exp_time DO carry inf
    # sentinels by design; they are consumed only by lexsort/min, which
    # tolerate inf — never by a 0/1 multiply.)
    assert bool(jnp.all(jnp.isfinite(pw.obs9))), (
        "pairwise_vo.obs9 carries a non-finite sentinel — the one-hot "
        "selection in vo_observation would be corrupted (0*inf = nan)")
    assert bool(jnp.all(jnp.isfinite(pw.sort_d))) and bool(
        jnp.all(jnp.isfinite(pw.min_dis4)))
