"""Flag-matrix smoke test: every advertised config flag must construct
through ``make_train`` and execute one jitted train block.

Round-3 post-mortem: ``--gru_impl pallas`` shipped broken for the PPO
family (an UnboundLocalError inside ``make_train``) while 143 tests were
green, because the kernel tests exercised ``nets.rnn_seq_apply`` directly
and no test built the config through the factory. This matrix closes that
class of bug: a flag that cannot at least run one block cannot ship.

Each case is (family, overrides); the base configs mirror the minimal
matrix-game smoke settings of the per-family tests. The assertion is
executional (finite losses, ≥1 gradient update where the family exposes
a counter) — learning quality is covered by the per-family tests and
the guarded validation configs.

Reference surface being protected: the per-file Args contract of the
reference scripts (vdn.py:17-76 and siblings) — every knob the README
advertises corresponds to a reference Args field or a documented §4b
deviation, and every one of them must execute.
"""
import jax
import numpy as np
import pytest

from cleanmarl_tpu.algos import coma as m_coma
from cleanmarl_tpu.algos import facmac as m_facmac
from cleanmarl_tpu.algos import maddpg as m_maddpg
from cleanmarl_tpu.algos import qmix as m_qmix
from cleanmarl_tpu.algos import recurrent_q as m_recq
from cleanmarl_tpu.algos import vdn as m_vdn
from cleanmarl_tpu.algos.ippo import make_train as make_ippo
from cleanmarl_tpu.algos.mappo import make_train as make_mappo
from cleanmarl_tpu.algos.ppo_common import PPOConfig
from cleanmarl_tpu.envs.matrix_game import MatrixGame


def tiny_env():
    return MatrixGame(n_agents=2, n_actions=3, episode_limit=8)


# --- per-family minimal bases (one short block each) ---------------------

PPO_BASE = dict(env_type="matrix", num_envs=8, total_timesteps=512,
                epochs=2, log_interval=2, num_eval_ep=2, seed=0)
COMA_BASE = dict(env_type="matrix", num_envs=8, total_timesteps=512,
                 log_interval=2, num_eval_ep=2, seed=0)
VDN_BASE = dict(env_type="matrix", num_envs=8, buffer_size=512,
                total_timesteps=2000, learning_starts=64, train_freq=1,
                batch_size=8, log_interval=20, num_eval_ep=2, seed=0)
QMIX_BASE = dict(env_type="matrix", num_envs=8, buffer_size=128,
                 total_timesteps=2000, train_freq=1, batch_size=8,
                 hidden_dim=32, hyper_dim=16, embed_dim=8,
                 log_interval=20, num_eval_ep=2, seed=0)
RECQ_BASE = dict(env_type="matrix", num_envs=8, buffer_size=128,
                 total_timesteps=2000, train_freq=1, batch_size=8,
                 hidden_dim=32, hyper_dim=16, embed_dim=8,
                 log_interval=20, num_eval_ep=2, seed=0)
MADDPG_BASE = dict(env_type="matrix", num_envs=8, buffer_size=128,
                   total_timesteps=2000, train_freq=1, batch_size=8,
                   actor_hidden_dim=16, critic_hidden_dim=32,
                   log_interval=20, num_eval_ep=2, seed=0)
FACMAC_BASE = dict(env_type="matrix", num_envs=8, buffer_size=128,
                   total_timesteps=2000, train_freq=1, batch_size=8,
                   actor_hidden_dim=16, critic_hidden_dim=32,
                   hyper_dim=16, embed_dim=8,
                   log_interval=20, num_eval_ep=2, seed=0)

# Every advertised flag appears in at least one case below.
CASES = [
    # --- PPO family (ippo.py / mappo.py Args + §4b deviations) ---
    ("ippo", dict(recurrent=True, gru_impl="pallas")),       # r3 regression
    ("mappo", dict(recurrent=True, gru_impl="pallas")),
    # "auto" (default, round 5) must resolve and run everywhere — on the
    # CPU test backend it resolves to xla; combined with the kernel's
    # unsupported modes it must pick xla rather than raise
    ("ippo", dict(recurrent=True, gru_impl="auto")),
    ("ippo", dict(recurrent=True, gru_impl="auto", tbptt=2)),
    ("mappo", dict(recurrent=True, gru_impl="auto",
                   compute_dtype="bfloat16")),
    ("ippo", dict(recurrent=True, compute_dtype="bfloat16")),
    ("mappo", dict(recurrent=True, compute_dtype="bfloat16",
                   num_minibatches=2)),
    ("ippo", dict(recurrent=True, remat_actor=True)),
    ("ippo", dict(recurrent=True, tbptt=4)),
    ("ippo", dict(num_minibatches=2)),
    ("mappo", dict(recurrent=True, num_minibatches=4, anneal_lr=True,
                   anneal_entropy=True)),
    ("ippo", dict(normalize_reward=True, normalize_advantage=True,
                  normalize_return=True)),
    ("ippo", dict(recurrent=True, rollout_len=6)),
    ("mappo", dict(recurrent=True, death_masking=True,
                   normalize_values=True)),
    ("ippo", dict(death_masking=True, normalize_values=True,
                  num_minibatches=2)),
    # --- COMA family (coma.py Args) ---
    ("coma", dict(recurrent=True)),
    ("coma", dict(use_tdlambda=False, nsteps=3)),
    ("coma", dict(bootstrap_truncation=True)),
    ("coma", dict(normalize_reward=True, normalize_return=True,
                  anneal_lr=True)),
    ("coma", dict(critic_epochs=3, anneal_entropy=True)),
    ("coma", dict(critic_epochs=4, anneal_lr=True)),
    # --- VDN family (vdn.py Args) ---
    ("vdn", dict(bootstrap_truncation=True)),
    ("vdn", dict(normalize_reward=True)),
    # --- QMIX family (qmix.py / qmix_memefficient.py Args) ---
    ("qmix", dict(memefficient=True)),
    ("qmix", dict(double_q=False)),
    ("qmix", dict(hard_target=True, target_network_update_freq=4)),
    ("qmix", dict(max_updates_per_iter=1)),
    ("qmix", dict(bootstrap_truncation=True, normalize_reward=True)),
    # --- recurrent-Q family (vdn_lstm.py / qmix_lstm.py Args) ---
    ("recq", dict(mixing="qmix")),
    ("recq", dict(replay="sequence", seq_length=6, burn_in=2)),
    ("recq", dict(tbptt=4)),
    ("recq", dict(compute_dtype="bfloat16")),
    ("recq", dict(gru_impl="pallas")),
    ("recq", dict(gru_impl="auto")),
    ("recq", dict(mixing="qmix", max_updates_per_iter=1)),
    ("recq", dict(bootstrap_truncation=True, normalize_reward=True)),
    # --- MADDPG family (maddpg.py / maddpg_lstm.py Args) ---
    ("maddpg", dict(recurrent=True)),
    ("maddpg", dict(max_updates_per_iter=1)),
    ("maddpg", dict(normalize_reward=False)),
    # --- FACMAC family (facmac.py Args) ---
    ("facmac", dict(max_updates_per_iter=1)),
    ("facmac", dict(normalize_reward=True)),
]

FAMILIES = {
    # name -> (factory, Config, base overrides)
    "ippo": (make_ippo, PPOConfig, PPO_BASE),
    "mappo": (make_mappo, PPOConfig, PPO_BASE),
    "coma": (lambda cfg, env: m_coma.make_train(cfg, env),
             m_coma.COMAConfig, COMA_BASE),
    "vdn": (lambda cfg, env: m_vdn.make_train(cfg, env),
            m_vdn.VDNConfig, VDN_BASE),
    "qmix": (lambda cfg, env: m_qmix.make_train(cfg, env),
             m_qmix.QMIXConfig, QMIX_BASE),
    "recq": (lambda cfg, env: m_recq.make_train(cfg, env),
             m_recq.RecurrentQConfig, RECQ_BASE),
    "maddpg": (lambda cfg, env: m_maddpg.make_train(cfg, env),
               m_maddpg.MADDPGConfig, MADDPG_BASE),
    "facmac": (lambda cfg, env: m_facmac.make_train(cfg, env),
               m_facmac.FACMACConfig, FACMAC_BASE),
}


def _case_id(case):
    fam, over = case
    return fam + "-" + "-".join(f"{k}={v}" for k, v in over.items())


@pytest.mark.parametrize("case", CASES, ids=_case_id)
def test_flag_executes_one_block(case):
    fam, over = case
    factory, Config, base = FAMILIES[fam]
    cfg = Config(**{**base, **over})
    out = factory(cfg, tiny_env())
    init, train_block = out[0], out[1]
    runner = init(jax.random.PRNGKey(0))
    runner, metrics = train_block(runner)
    for k, v in metrics.items():
        arr = np.asarray(v, dtype=np.float64)
        assert np.all(np.isfinite(arr)), (k, v)
    # where the runner counts updates, demand the flagged path actually
    # took a gradient step inside the block
    n_upd = getattr(runner, "num_updates", None)
    if n_upd is not None:
        assert int(n_upd) > 0, "block ran but no update executed"


def test_matrix_covers_every_advertised_flag():
    """The matrix itself is guarded: these flags must each appear in
    ≥1 case so a future flag can't silently drop out of coverage."""
    advertised = {
        "ippo": ["recurrent", "tbptt", "gru_impl", "compute_dtype",
                 "remat_actor", "num_minibatches", "anneal_lr",
                 "anneal_entropy", "normalize_reward",
                 "normalize_advantage", "normalize_return", "rollout_len",
                 "death_masking", "normalize_values"],
        "coma": ["recurrent", "use_tdlambda", "nsteps",
                 "bootstrap_truncation", "normalize_reward",
                 "normalize_return", "anneal_lr", "critic_epochs",
                 "anneal_entropy"],
        "vdn": ["bootstrap_truncation", "normalize_reward"],
        "qmix": ["memefficient", "double_q", "hard_target",
                 "max_updates_per_iter", "bootstrap_truncation",
                 "normalize_reward"],
        "recq": ["mixing", "replay", "seq_length", "burn_in", "tbptt",
                 "compute_dtype", "gru_impl", "max_updates_per_iter",
                 "bootstrap_truncation", "normalize_reward"],
        "maddpg": ["recurrent", "max_updates_per_iter",
                   "normalize_reward"],
        "facmac": ["max_updates_per_iter", "normalize_reward"],
    }
    for fam, flags in advertised.items():
        fams = {fam, "mappo"} if fam == "ippo" else {fam}
        covered = set()
        for f, over in CASES:
            if f in fams:
                covered.update(over)
        missing = set(flags) - covered
        assert not missing, (fam, sorted(missing))
