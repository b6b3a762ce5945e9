"""MicroCombat (SMAClite-class) behavioral tests."""
import jax
import jax.numpy as jnp
import numpy as np

from cleanmarl_tpu.envs import smaclite
from cleanmarl_tpu.envs.base import VecEnv
from cleanmarl_tpu.envs.smaclite import (
    DAMAGE, MAX_HP, N_FIXED_ACTIONS, REWARD_KILL, REWARD_WIN, SHOOT_RANGE,
    MicroCombat,
)


def test_3m_interface_dims():
    env = smaclite.make("3m")
    assert env.n_agents == 3
    assert env.n_actions == 9            # 6 + 3 enemies
    assert env.obs_dim == 30             # SMAC 3m obs size
    assert env.state_dim == 48           # SMAC 3m state size
    s, ts = env.reset(jax.random.PRNGKey(0))
    assert ts.obs.shape == (3, 30)
    assert ts.state.shape == (48,)


def test_map_parsing():
    env = smaclite.make("5m_vs_6m")
    assert env.n_agents == 5 and env.n_enemies == 6
    assert env.n_actions == 6 + 6
    try:
        smaclite.make("1c3s5z")  # colossus not supported
        assert False, "expected ValueError"
    except ValueError as e:
        assert "1c3s5z" in str(e)


def test_avail_masks_at_spawn():
    env = smaclite.make("3m")
    s, ts = env.reset(jax.random.PRNGKey(0))
    avail = np.asarray(ts.avail)
    # alive: no-op unavailable, stop available
    assert not avail[:, 0].any()
    assert avail[:, 1].all()
    # spawn distance ~14 > shoot range → no attacks available
    assert not avail[:, N_FIXED_ACTIONS:].any()
    # all moves in-bounds at spawn
    assert avail[:, 2:6].all()


def test_move_east_closes_distance_and_enables_attack():
    env = smaclite.make("3m")
    s, ts = env.reset(jax.random.PRNGKey(0))
    d0 = float(jnp.linalg.norm(s.ally_pos[0] - s.enemy_pos[0]))
    min_d, seen_attack = d0, False
    for _ in range(10):  # move east (action 4) repeatedly
        s, ts = env.step(s, jnp.full((3,), 4, jnp.int32), jax.random.PRNGKey(1))
        min_d = min(min_d, float(jnp.linalg.norm(s.ally_pos[0] - s.enemy_pos[0])))
        seen_attack |= bool(np.asarray(ts.avail)[:, N_FIXED_ACTIONS:].any())
    # the teams closed distance during the march and attacks became
    # available at contact (allies may then overshoot past the enemy
    # line — the bot pursues with a short leash, not a beeline)
    assert min_d < d0
    assert seen_attack


def test_combat_damage_and_kill_reward():
    env = MicroCombat(2, 2, time_limit=100)
    s, ts = env.reset(jax.random.PRNGKey(0))
    # teleport: everyone point-blank; enemy 0 at 1 hp
    s = s.replace(
        ally_pos=jnp.array([[16.0, 16.0], [16.0, 17.0]]),
        enemy_pos=jnp.array([[17.0, 16.0], [17.0, 17.0]]),
        enemy_hp=jnp.array([1.0, MAX_HP]),
        ally_cd=jnp.zeros((2,)),
    )
    # both agents attack enemy 0 (action 6+0)
    s2, ts2 = env.step(s, jnp.array([6, 6]), jax.random.PRNGKey(1))
    assert float(s2.enemy_hp[0]) == 0.0
    # reward = (1 hp of damage + kill bonus) * scale; no win yet
    expected = (1.0 + REWARD_KILL) * env.reward_scale
    np.testing.assert_allclose(float(ts2.reward), expected, rtol=1e-5)
    assert not bool(ts2.done)
    # dead enemy no longer attackable
    assert not np.asarray(ts2.avail)[:, N_FIXED_ACTIONS].any()


def test_win_gives_bonus_and_terminates():
    env = MicroCombat(2, 1, time_limit=100)
    s, ts = env.reset(jax.random.PRNGKey(0))
    s = s.replace(
        ally_pos=jnp.array([[16.0, 16.0], [16.0, 17.0]]),
        enemy_pos=jnp.array([[17.0, 16.0]]),
        enemy_hp=jnp.array([2 * DAMAGE]),  # dies to one volley from 2 agents
        ally_cd=jnp.zeros((2,)),
    )
    s2, ts2 = env.step(s, jnp.array([6, 6]), jax.random.PRNGKey(1))
    assert bool(ts2.done) and bool(ts2.info["battle_won"] == 1.0)
    expected = (2 * DAMAGE + REWARD_KILL + REWARD_WIN) * env.reward_scale
    np.testing.assert_allclose(float(ts2.reward), expected, rtol=1e-5)


def test_enemy_ai_fights_back_and_can_wipe_team():
    """Passive agents near the enemy get shot; episode ends in a loss."""
    env = MicroCombat(2, 2, time_limit=100)
    s, ts = env.reset(jax.random.PRNGKey(0))
    s = s.replace(
        ally_pos=jnp.array([[16.0, 16.0], [16.0, 17.0]]),
        enemy_pos=jnp.array([[17.0, 16.0], [17.0, 17.0]]),
    )
    done = False
    for i in range(40):
        s, ts = env.step(s, jnp.ones((2,), jnp.int32), jax.random.PRNGKey(i))
        if bool(ts.done):
            done = True
            break
    assert done
    assert float(ts.info["battle_won"]) == 0.0
    assert float(jnp.sum(s.ally_hp)) == 0.0


def test_dead_agents_noop_only_and_zero_obs():
    env = MicroCombat(2, 2, time_limit=100)
    s, ts = env.reset(jax.random.PRNGKey(0))
    s = s.replace(ally_hp=jnp.array([0.0, MAX_HP]))
    s2, ts2 = env.step(s, jnp.array([1, 1]), jax.random.PRNGKey(1))
    avail = np.asarray(ts2.avail)
    assert avail[0, 0] and not avail[0, 1:].any()   # dead: no-op only
    np.testing.assert_allclose(np.asarray(ts2.obs[0]), 0.0)
    assert avail[1, 1]                               # alive: stop available


def test_truncation_at_time_limit():
    env = MicroCombat(3, 3, time_limit=5)
    vec = VecEnv(env, 2, auto_reset=False)
    key = jax.random.PRNGKey(0)
    state, ts = vec.reset(key)
    for _ in range(5):  # everyone stops; no one dies
        state, ts, _ = vec.step(state, jnp.ones((2, 3), jnp.int32), key)
    assert bool(jnp.all(ts.truncated)) and not bool(jnp.any(ts.done))


def test_cooldown_limits_fire_rate():
    env = MicroCombat(1, 1, time_limit=100)
    s, ts = env.reset(jax.random.PRNGKey(0))
    s = s.replace(
        ally_pos=jnp.array([[16.0, 16.0]]),
        enemy_pos=jnp.array([[17.0, 16.0]]),
        enemy_hp=jnp.array([MAX_HP]),
    )
    s1, ts1 = env.step(s, jnp.array([6]), jax.random.PRNGKey(1))
    assert float(s1.enemy_hp[0]) == MAX_HP - DAMAGE   # first shot lands
    s2, ts2 = env.step(s1, jnp.array([6]), jax.random.PRNGKey(2))
    # cooldown 1.0 → cannot fire on the immediately following step
    assert float(s2.enemy_hp[0]) == MAX_HP - DAMAGE
    s3, ts3 = env.step(s2, jnp.array([6]), jax.random.PRNGKey(3))
    assert float(s3.enemy_hp[0]) == MAX_HP - 2 * DAMAGE


def test_2s3z_heterogeneous_map():
    env = smaclite.make("2s3z")
    assert env.n_agents == 5 and env.n_enemies == 5
    assert env.n_actions == 6 + 5
    # shields + 2 type bits present: unit feat = 5+1+2 = 8
    assert env._unit_feat == 8
    assert env.obs_dim == 4 + 5 * 8 + 4 * 8 + (1 + 1 + 2)
    s, ts = env.reset(jax.random.PRNGKey(0))
    assert ts.obs.shape == (5, env.obs_dim)
    assert ts.state.shape == (env.state_dim,)
    # stalkers first: full shields at spawn
    np.testing.assert_allclose(np.asarray(s.ally_shield[:2]), 80.0)
    np.testing.assert_allclose(np.asarray(s.ally_shield[2:]), 50.0)


def test_shields_absorb_before_hp():
    from cleanmarl_tpu.envs.smaclite import MicroCombat as MC

    env = MC(["marine"], ["stalker"], time_limit=50)
    s, _ = env.reset(jax.random.PRNGKey(0))
    s = s.replace(
        ally_pos=jnp.array([[16.0, 16.0]]),
        enemy_pos=jnp.array([[17.0, 16.0]]),
    )
    s2, ts = env.step(s, jnp.array([6]), jax.random.PRNGKey(1))  # attack
    # marine dmg 6 absorbed entirely by the 80-point shield
    assert float(s2.enemy_hp[0]) == 80.0
    assert float(s2.enemy_shield[0]) == 74.0
    # damage reward counts shield damage
    assert float(ts.reward) > 0.0


def test_shield_regen_when_unhit():
    from cleanmarl_tpu.envs.smaclite import MicroCombat as MC

    env = MC(["marine"], ["stalker"], time_limit=50)
    s, _ = env.reset(jax.random.PRNGKey(0))
    # damage the shield, then stop far away → regen +2/step
    s = s.replace(
        enemy_shield=jnp.array([10.0]),
        ally_pos=jnp.array([[2.0, 2.0]]),
        enemy_pos=jnp.array([[30.0, 30.0]]),
    )
    s2, _ = env.step(s, jnp.array([1]), jax.random.PRNGKey(1))  # stop
    assert float(s2.enemy_shield[0]) == 12.0


def test_zealot_attack_move_closes_distance():
    from cleanmarl_tpu.envs.smaclite import MicroCombat as MC

    env = MC(["zealot"], ["zealot"], time_limit=50)
    s, _ = env.reset(jax.random.PRNGKey(0))
    s = s.replace(
        ally_pos=jnp.array([[16.0, 16.0]]),
        enemy_pos=jnp.array([[21.0, 16.0]]),  # within order range 6, melee 1.5
    )
    d0 = 5.0
    s2, ts = env.step(s, jnp.array([6]), jax.random.PRNGKey(1))
    d1 = float(jnp.linalg.norm(s2.ally_pos[0] - s2.enemy_pos[0]))
    assert d1 < d0  # attack order out of melee range approaches the target
    # no damage dealt yet (still out of melee range)
    assert float(s2.enemy_hp[0]) == 100.0 or float(s2.enemy_shield[0]) == 50.0


def test_marine_maps_keep_classic_dims():
    env = smaclite.make("3m")
    assert env.obs_dim == 30 and env.state_dim == 48


def test_3m_winnable_by_scripted_micro():
    """Env-balance pin (VERDICT r1): 3m must be winnable at SMAC rates.

    A scripted focus-fire + tanking-rotation policy (pull the locked,
    wounded ally back while its weapon cools down) must win ≥95% — the
    property that makes the north-star MAPPO ≥0.95 target reachable.
    Full study: scripts/forensic_3m_scripted.py (99.98% over ~11k eps).
    """
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from scripts.forensic_3m_scripted import policy_focus_retreat

    env = smaclite.make("3m")

    def one_ep(key):
        s, ts = env.reset(key)

        def body(carry):
            s, ts, key, _ = carry
            key, k = jax.random.split(key)
            a = policy_focus_retreat(s, ts.avail, env).astype(jnp.int32)
            s2, ts2 = env.step(s, a, k)
            return (s2, ts2, key, ts2.info["battle_won"])

        def cond(carry):
            _, ts, _, _ = carry
            return jnp.logical_not(ts.done | ts.truncated)

        *_, won = jax.lax.while_loop(cond, body, (s, ts, key, jnp.zeros(())))
        return won

    wins = jax.jit(jax.vmap(one_ep))(jax.random.split(jax.random.PRNGKey(0), 256))
    assert float(wins.mean()) >= 0.95
