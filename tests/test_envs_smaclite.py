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


def test_per_type_movement_speed():
    """ENVS_FIDELITY S3 (closed round 5): a stalker's move action covers
    speed-scaled distance (2.0 * 4.13/3.15 ≈ 2.62) while a zealot's
    covers the base 2.0 — and the scripted bot's units pursue at their
    own type's speed. Marine moves stay exactly 2.0 (bit-compat with the
    uniform-speed era)."""
    env = MicroCombat(["stalker", "zealot"], ["stalker", "zealot"],
                      time_limit=50)
    s, ts = env.reset(jax.random.PRNGKey(0))
    pos0 = np.asarray(s.ally_pos)
    # both agents move north (action 2)
    s2, _ = env.step(s, jnp.array([2, 2], jnp.int32), jax.random.PRNGKey(1))
    moved = np.asarray(s2.ally_pos) - pos0
    np.testing.assert_allclose(moved[0], [0.0, 2.0 * 4.13 / 3.15], rtol=1e-6)
    np.testing.assert_allclose(moved[1], [0.0, 2.0], rtol=1e-6)
    # marine maps: exactly the historical 2.0 per move step
    env3 = smaclite.make("3m")
    np.testing.assert_array_equal(np.asarray(env3.a_move), 2.0)


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


def test_mmm_map_dims_and_layout():
    """Conformance pin: MMM (1 medivac + 2 marauders + 7 marines,
    mirrored) — action/obs/state sizes follow the documented layout."""
    env = smaclite.make("MMM")
    assert env.n_agents == 10 and env.n_enemies == 10
    assert env.n_actions == 6 + 10
    # terran-only: no shields; 3 unit types → unit feat = 5+0+3 = 8
    assert env._unit_feat == 8
    assert env.obs_dim == 4 + 10 * 8 + 9 * 8 + (1 + 0 + 3)
    assert env.state_dim == 10 * (4 + 3) + 10 * (3 + 3) + 10 * env.n_actions
    s, ts = env.reset(jax.random.PRNGKey(0))
    assert ts.obs.shape == (10, env.obs_dim)
    assert ts.state.shape == (env.state_dim,)
    assert ts.avail.shape == (10, env.n_actions)


def test_mmm2_asymmetric_dims():
    env = smaclite.make("MMM2")
    assert env.n_agents == 10 and env.n_enemies == 12
    assert env.n_actions == 6 + 12
    assert env.obs_dim == 4 + 12 * 8 + 9 * 8 + (1 + 0 + 3)


def test_medivac_heals_ally_not_enemies():
    """The medivac's target actions heal allies (never attack): healing
    restores hp up to max, yields no reward, and its avail-mask targets
    are ally-indexed."""
    env = smaclite.make("MMM")
    s, _ = env.reset(jax.random.PRNGKey(0))
    # wound marine #5 and park the medivac (#0) on top of it; enemies
    # spawn ~14 units away (out of sight), so no combat this step
    s = s.replace(
        ally_hp=s.ally_hp.at[5].set(10.0),
        ally_pos=s.ally_pos.at[0].set(s.ally_pos[5] + 1.0),
    )
    avail = np.asarray(env._avail(s))
    assert avail[0, N_FIXED_ACTIONS + 5]          # heal wounded marine
    assert not avail[0, N_FIXED_ACTIONS + 0]      # never itself
    # a marine's target block is enemy-indexed: nothing in range at spawn
    assert not avail[3, N_FIXED_ACTIONS:].any()
    actions = jnp.ones((10,), jnp.int32).at[0].set(N_FIXED_ACTIONS + 5)
    s2, ts = env.step(s, actions, jax.random.PRNGKey(1))
    assert float(s2.ally_hp[5]) == 10.0 + smaclite.UNIT_TYPES["medivac"]["dmg"]
    assert float(ts.reward) == 0.0                # healing earns nothing
    # heal is capped at max hp
    s3 = s.replace(ally_hp=s.ally_hp.at[5].set(44.0))
    s4, _ = env.step(s3, actions, jax.random.PRNGKey(1))
    assert float(s4.ally_hp[5]) == smaclite.UNIT_TYPES["marine"]["hp"]


def test_enemy_medivac_heals_its_team():
    """The scripted bot's medivac follows and heals its most damaged
    living teammate."""
    env = smaclite.make("MMM")
    s, _ = env.reset(jax.random.PRNGKey(0))
    # wound enemy marine #5; park the enemy medivac (#0) next to it;
    # allies far away → bot has no combat targets
    s = s.replace(
        enemy_hp=s.enemy_hp.at[5].set(10.0),
        enemy_pos=s.enemy_pos.at[0].set(s.enemy_pos[5] + 1.0),
    )
    actions = jnp.ones((10,), jnp.int32)  # allies all stop
    s2, _ = env.step(s, actions, jax.random.PRNGKey(1))
    assert float(s2.enemy_hp[5]) == 10.0 + smaclite.UNIT_TYPES["medivac"]["dmg"]


def test_mmm_episode_runs_and_terminates():
    """Full MMM episodes run under the vectorized auto-reset wrapper and
    resolve (someone wins or the clock runs out) with finite rewards."""
    env = smaclite.make("MMM", time_limit=60)
    vec = VecEnv(env, 4)
    key = jax.random.PRNGKey(0)
    es, ts = vec.reset(key)

    def step(carry, _):
        es, ts, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        # uniform random over available actions
        logits = jnp.where(ts.avail, 0.0, -1e9)
        acts = jax.random.categorical(k1, logits).astype(jnp.int32)
        es, ts2, _ = vec.step(es, acts, k2)
        return (es, ts2, key), (ts2.reward, ts2.done | ts2.truncated)

    (_, _, _), (rews, endeds) = jax.lax.scan(step, (es, ts, key), None, length=120)
    assert np.isfinite(np.asarray(rews)).all()
    assert np.asarray(endeds).any()      # episodes end within 2× limit


# ---------------------------------------------------------------------------
# ENVS_FIDELITY.md fixtures (VERDICT r2 missing-3): pin the unit-type
# stat effects and the medivac bookkeeping documented in the dossier.
# ---------------------------------------------------------------------------

def test_unit_stat_table_ratios():
    """ENVS_FIDELITY S1: the stat table keeps SMAC's unit identities —
    hp/shield pools, damage-per-shot, integer cooldowns, melee vs ranged
    — and the 3m reward normalization is SMAC's reward_scale_rate=20."""
    from cleanmarl_tpu.envs.smaclite import UNIT_TYPES

    t = UNIT_TYPES
    assert t["marine"] == dict(hp=45.0, shield=0.0, dmg=6.0, cd=1.0,
                               rng=6.0, speed=3.15)
    # S3 (closed round 5): per-type SC2 speeds — stalkers/medivacs
    # (4.13) outrun the 3.15 classes; marine stays at the base speed
    # so marine-map dynamics are unchanged
    assert t["stalker"]["speed"] == t["medivac"]["speed"] == 4.13
    assert t["zealot"]["speed"] == t["marauder"]["speed"] == 3.15
    assert t["stalker"]["hp"] == t["stalker"]["shield"] == 80.0
    assert t["zealot"]["rng"] < 2.0 < t["stalker"]["rng"]   # melee vs ranged
    assert t["marauder"]["cd"] == t["stalker"]["cd"] == 2.0  # slow hitters
    assert t["medivac"].get("heal") is True
    assert not any(
        t[u].get("heal", False) for u in ("marine", "stalker", "zealot",
                                          "marauder")
    )
    env = smaclite.make("3m")
    max_return = 3 * 45.0 + 3 * REWARD_KILL + REWARD_WIN
    np.testing.assert_allclose(env.reward_scale, 20.0 / max_return, rtol=1e-6)


def test_marauder_two_step_cooldown_in_mmm():
    """ENVS_FIDELITY S1: a marauder (cd=2) fires 12, then sits out two
    steps before the next shot — fire, wait, wait, fire."""
    env = MicroCombat(["marauder"], ["marine"], time_limit=50)
    s, _ = env.reset(jax.random.PRNGKey(0))
    s = s.replace(
        ally_pos=jnp.array([[16.0, 16.0]]),
        enemy_pos=jnp.array([[17.0, 16.0]]),
    )
    hp = [45.0]
    for _ in range(4):
        s, _ = env.step(s, jnp.array([6]), jax.random.PRNGKey(1))
        hp.append(float(s.enemy_hp[0]))
    assert hp == [45.0, 33.0, 33.0, 33.0, 21.0]


def test_stalker_shield_arithmetic_2s3z():
    """ENVS_FIDELITY S6: a stalker shot (13) into a full 80 shield takes
    shield to 67 and leaves hp intact; into a 5-point shield it spills 8
    into hp — and both count identically as damage reward."""
    env = MicroCombat(["stalker"], ["stalker"], time_limit=50)
    s, _ = env.reset(jax.random.PRNGKey(0))
    base = s.replace(
        ally_pos=jnp.array([[16.0, 16.0]]),
        enemy_pos=jnp.array([[17.0, 16.0]]),
    )
    s2, ts2 = env.step(base, jnp.array([6]), jax.random.PRNGKey(1))
    assert float(s2.enemy_shield[0]) == 67.0
    assert float(s2.enemy_hp[0]) == 80.0

    spill = base.replace(enemy_shield=jnp.array([5.0]))
    s3, ts3 = env.step(spill, jnp.array([6]), jax.random.PRNGKey(1))
    assert float(s3.enemy_shield[0]) == 0.0
    assert float(s3.enemy_hp[0]) == 72.0
    np.testing.assert_allclose(float(ts2.reward), float(ts3.reward), rtol=1e-6)


def test_zealot_closes_then_strikes():
    """ENVS_FIDELITY S5: a zealot ordered to attack from 5 away deals no
    damage that step (out of melee range 1.5, approaches 2.0 instead) and
    lands its 16-damage hit once the attack-move brings it to melee."""
    env = MicroCombat(["zealot"], ["marine"], time_limit=50)
    s, _ = env.reset(jax.random.PRNGKey(0))
    s = s.replace(
        ally_pos=jnp.array([[16.0, 16.0]]),
        enemy_pos=jnp.array([[21.0, 16.0]]),
    )
    s1, _ = env.step(s, jnp.array([6]), jax.random.PRNGKey(1))
    assert float(s1.enemy_hp[0]) == 45.0          # still out of melee range
    s2, _ = env.step(s1, jnp.array([6]), jax.random.PRNGKey(2))
    assert float(s2.enemy_hp[0]) == 45.0 - 16.0   # closed to melee, struck


def test_medivac_heal_caps_and_no_resurrection_under_crossfire(
):
    """ENVS_FIDELITY S9 on MMM2: heals land AFTER the step's incoming
    damage, cap at max hp, and cannot resurrect an ally killed in the
    same step."""
    env = smaclite.make("MMM2")
    assert env.n_agents == 10 and env.n_enemies == 12
    s, _ = env.reset(jax.random.PRNGKey(0))
    far_allies = jnp.stack(
        [jnp.full((10,), 2.0), 2.0 + jnp.arange(10.0) * 2.0], axis=-1
    )
    far_enemies = jnp.stack(
        [jnp.full((12,), 30.0), 2.0 + jnp.arange(12.0) * 2.0], axis=-1
    )
    # medivac (ally 0) beside marine ally 3; ONE enemy marine (enemy 4)
    # in range of ally 3; everyone else out of sight
    base = s.replace(
        ally_pos=far_allies.at[0].set(jnp.array([16.0, 17.0]))
                           .at[3].set(jnp.array([16.0, 16.0])),
        enemy_pos=far_enemies.at[4].set(jnp.array([17.0, 16.0])),
    )
    acts = jnp.ones((10,), jnp.int32).at[0].set(6 + 3)   # heal ally 3

    # crossfire: 30 hp − 6 (enemy marine) + 8 (heal) = 32
    s1, _ = env.step(
        base.replace(ally_hp=base.ally_hp.at[3].set(30.0)), acts,
        jax.random.PRNGKey(1),
    )
    assert float(s1.ally_hp[3]) == 32.0

    # cap: 44 − 6 + 8 caps at the marine's 45 max
    s2, _ = env.step(
        base.replace(ally_hp=base.ally_hp.at[3].set(44.0)), acts,
        jax.random.PRNGKey(1),
    )
    assert float(s2.ally_hp[3]) == 45.0

    # no resurrection: 4 − 6 kills ally 3 before the heal lands
    s3, _ = env.step(
        base.replace(ally_hp=base.ally_hp.at[3].set(4.0)), acts,
        jax.random.PRNGKey(1),
    )
    assert float(s3.ally_hp[3]) == 0.0


def test_medivac_cannot_attack_and_soldiers_cannot_heal():
    """ENVS_FIDELITY S9: in the shared target-action block, medivac rows
    carry only heal bits (allies) and soldier rows only attack bits
    (enemies)."""
    env = smaclite.make("MMM")          # mirror: medivac, 2 marauders, 7 marines
    s, _ = env.reset(jax.random.PRNGKey(0))
    far_allies = jnp.stack(
        [jnp.full((10,), 2.0), 2.0 + jnp.arange(10.0) * 2.0], axis=-1
    )
    far_enemies = jnp.stack(
        [jnp.full((10,), 30.0), 2.0 + jnp.arange(10.0) * 2.0], axis=-1
    )
    # medivac (ally 0) adjacent ONLY to an enemy marine; marine ally 3
    # adjacent ONLY to a damaged ally marine (ally 4), no enemy in range
    s = s.replace(
        ally_pos=far_allies.at[0].set(jnp.array([16.0, 16.0]))
                           .at[3].set(jnp.array([6.0, 16.0]))
                           .at[4].set(jnp.array([7.0, 16.0])),
        enemy_pos=far_enemies.at[4].set(jnp.array([17.0, 16.0])),
        ally_hp=s.ally_hp.at[4].set(10.0),
    )
    avail = np.asarray(env._avail(s))
    # medivac: enemy adjacent but no ally in heal range → no target bits
    assert not avail[0, N_FIXED_ACTIONS:].any()
    # soldier: damaged ally adjacent but no enemy in range → no target bits
    assert not avail[3, N_FIXED_ACTIONS:].any()


def test_unit_collisions_opt_in_pushout():
    """ENVS_FIDELITY S11 lever: with ``unit_collisions=True`` two live
    units closer than 2*UNIT_RADIUS are pushed apart; the default env
    leaves them overlapped (validated maps were recorded without
    collisions, so the lever must be opt-in)."""
    from cleanmarl_tpu.envs.smaclite import UNIT_RADIUS, MicroCombat as MC

    overlap_state = dict(
        ally_pos=jnp.array([[16.0, 16.0], [16.2, 16.0]]),
        enemy_pos=jnp.array([[30.0, 2.0], [30.0, 4.0]]),
    )
    stop = jnp.array([1, 1], jnp.int32)

    env_on = MC(2, 2, time_limit=50, unit_collisions=True)
    s, _ = env_on.reset(jax.random.PRNGKey(0))
    s = s.replace(**overlap_state)
    s2, _ = env_on.step(s, stop, jax.random.PRNGKey(1))
    gap = float(jnp.linalg.norm(s2.ally_pos[0] - s2.ally_pos[1]))
    assert gap > 0.2  # pushed apart toward 2*UNIT_RADIUS separation
    assert gap <= 2.0 * UNIT_RADIUS + 1e-5

    env_off = MC(2, 2, time_limit=50)
    s, _ = env_off.reset(jax.random.PRNGKey(0))
    s = s.replace(**overlap_state)
    s2, _ = env_off.step(s, stop, jax.random.PRNGKey(1))
    assert float(jnp.linalg.norm(s2.ally_pos[0] - s2.ally_pos[1])) < 0.21


def test_unit_collisions_ignore_dead_units():
    """A dead unit neither pushes nor gets pushed (S11 lever)."""
    from cleanmarl_tpu.envs.smaclite import MicroCombat as MC

    env = MC(2, 2, time_limit=50, unit_collisions=True)
    s, _ = env.reset(jax.random.PRNGKey(0))
    s = s.replace(
        ally_pos=jnp.array([[16.0, 16.0], [16.1, 16.0]]),
        ally_hp=s.ally_hp.at[1].set(0.0),   # overlapping corpse
        enemy_pos=jnp.array([[30.0, 2.0], [30.0, 4.0]]),
    )
    s2, _ = env.step(s, jnp.array([1, 0], jnp.int32), jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(s2.ally_pos[0]), [16.0, 16.0])
    np.testing.assert_allclose(np.asarray(s2.ally_pos[1]), [16.1, 16.0])
