"""CleanRL-style torch PPO on an envpool_tpu pool (counterpart of the
reference's ``examples/cleanrl_examples/ppo_atari_envpool.py``).

Demonstrates drop-in compatibility for torch users: the batched pool is
consumed through the gymnasium dialect exactly like envpool's — same
``envs.step(actions)`` 5-tuple, same ``info["env_id"]`` — with a
cleanrl-style episode-statistics wrapper on top. The policy runs in
torch (CPU here); the envs run wherever the family's tier puts them
(on-device TPU for CartPole).

Solves CartPole in ~30 iterations:

  python examples/cleanrl_ppo.py --num-envs 16 --iterations 40
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import time
from collections import deque

import numpy as np
import torch
import torch.nn as nn
from torch.distributions.categorical import Categorical

import envpool_tpu


class RecordEpisodeStatistics:
  """The cleanrl batched-episode-stats wrapper, gymnasium-dialect."""

  def __init__(self, env):
    self.env = env
    self.num_envs = len(env)
    self.returns = np.zeros(self.num_envs)
    self.lengths = np.zeros(self.num_envs, dtype=np.int64)
    self.finished = deque(maxlen=100)

  def reset(self):
    obs, info = self.env.reset()
    self.returns[:] = 0.0
    self.lengths[:] = 0
    return obs, info

  def step(self, action):
    obs, rew, term, trunc, info = self.env.step(action)
    self.returns += rew
    self.lengths += 1
    done = np.asarray(term) | np.asarray(trunc)
    for i in np.flatnonzero(done):
      self.finished.append((self.returns[i], self.lengths[i]))
      self.returns[i] = 0.0
      self.lengths[i] = 0
    return obs, rew, term, trunc, info


def layer_init(layer, std=np.sqrt(2), bias_const=0.0):
  nn.init.orthogonal_(layer.weight, std)
  nn.init.constant_(layer.bias, bias_const)
  return layer


class Agent(nn.Module):

  def __init__(self, obs_dim, act_n):
    super().__init__()
    self.critic = nn.Sequential(
      layer_init(nn.Linear(obs_dim, 64)), nn.Tanh(),
      layer_init(nn.Linear(64, 64)), nn.Tanh(),
      layer_init(nn.Linear(64, 1), std=1.0),
    )
    self.actor = nn.Sequential(
      layer_init(nn.Linear(obs_dim, 64)), nn.Tanh(),
      layer_init(nn.Linear(64, 64)), nn.Tanh(),
      layer_init(nn.Linear(64, act_n), std=0.01),
    )

  def get_value(self, x):
    return self.critic(x)

  def get_action_and_value(self, x, action=None):
    logits = self.actor(x)
    probs = Categorical(logits=logits)
    if action is None:
      action = probs.sample()
    return (
      action, probs.log_prob(action), probs.entropy(), self.critic(x)
    )


def main() -> None:
  p = argparse.ArgumentParser()
  p.add_argument("--task", type=str, default="CartPole-v1")
  p.add_argument("--num-envs", type=int, default=16)
  p.add_argument("--num-steps", type=int, default=128)
  p.add_argument("--iterations", type=int, default=40)
  p.add_argument("--lr", type=float, default=2.5e-4)
  p.add_argument("--gamma", type=float, default=0.99)
  p.add_argument("--gae-lambda", type=float, default=0.95)
  p.add_argument("--clip-coef", type=float, default=0.2)
  p.add_argument("--ent-coef", type=float, default=0.01)
  p.add_argument("--update-epochs", type=int, default=4)
  p.add_argument("--num-minibatches", type=int, default=4)
  p.add_argument("--seed", type=int, default=1)
  args = p.parse_args()

  torch.manual_seed(args.seed)
  envs = RecordEpisodeStatistics(envpool_tpu.make_gymnasium(
    args.task, num_envs=args.num_envs, seed=args.seed
  ))
  obs_dim = int(np.prod(envs.env.observation_space.shape))
  act_n = int(envs.env.action_space.n)
  agent = Agent(obs_dim, act_n)
  optimizer = torch.optim.Adam(agent.parameters(), lr=args.lr, eps=1e-5)

  n, t = args.num_envs, args.num_steps
  obs_buf = torch.zeros((t, n, obs_dim))
  act_buf = torch.zeros((t, n), dtype=torch.long)
  logp_buf = torch.zeros((t, n))
  rew_buf = torch.zeros((t, n))
  done_buf = torch.zeros((t, n))
  val_buf = torch.zeros((t, n))

  next_obs_np, _ = envs.reset()
  next_obs = torch.as_tensor(next_obs_np, dtype=torch.float32)
  next_done = torch.zeros(n)
  start = time.time()

  for it in range(args.iterations):
    for step in range(t):
      obs_buf[step] = next_obs
      done_buf[step] = next_done
      with torch.no_grad():
        action, logp, _, value = agent.get_action_and_value(next_obs)
      val_buf[step] = value.flatten()
      act_buf[step] = action
      logp_buf[step] = logp
      o, r, term, trunc, _ = envs.step(action.numpy().astype(np.int32))
      rew_buf[step] = torch.as_tensor(r, dtype=torch.float32)
      next_obs = torch.as_tensor(o, dtype=torch.float32)
      next_done = torch.as_tensor(
        (np.asarray(term) | np.asarray(trunc)).astype(np.float32)
      )

    with torch.no_grad():
      next_value = agent.get_value(next_obs).flatten()
      advantages = torch.zeros_like(rew_buf)
      lastgaelam = 0
      for s in reversed(range(t)):
        nextnonterm = 1.0 - (next_done if s == t - 1 else done_buf[s + 1])
        nextval = next_value if s == t - 1 else val_buf[s + 1]
        delta = (
          rew_buf[s] + args.gamma * nextval * nextnonterm - val_buf[s]
        )
        lastgaelam = (
          delta + args.gamma * args.gae_lambda * nextnonterm * lastgaelam
        )
        advantages[s] = lastgaelam
      returns = advantages + val_buf

    b_obs = obs_buf.reshape(-1, obs_dim)
    b_act = act_buf.reshape(-1)
    b_logp = logp_buf.reshape(-1)
    b_adv = advantages.reshape(-1)
    b_ret = returns.reshape(-1)
    batch = n * t
    mb = batch // args.num_minibatches
    idx = np.arange(batch)
    for _ in range(args.update_epochs):
      np.random.shuffle(idx)
      for s in range(0, batch, mb):
        mbi = idx[s:s + mb]
        _, newlogp, entropy, newval = agent.get_action_and_value(
          b_obs[mbi], b_act[mbi]
        )
        ratio = (newlogp - b_logp[mbi]).exp()
        adv = b_adv[mbi]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg1 = -adv * ratio
        pg2 = -adv * torch.clamp(
          ratio, 1 - args.clip_coef, 1 + args.clip_coef
        )
        pg_loss = torch.max(pg1, pg2).mean()
        v_loss = 0.5 * ((newval.flatten() - b_ret[mbi]) ** 2).mean()
        loss = pg_loss - args.ent_coef * entropy.mean() + v_loss
        optimizer.zero_grad()
        loss.backward()
        nn.utils.clip_grad_norm_(agent.parameters(), 0.5)
        optimizer.step()

    if envs.finished:
      rets = [r for r, _ in envs.finished]
      sps = (it + 1) * n * t / (time.time() - start)
      print(
        f"iter {it:3d}  episodic_return={np.mean(rets):7.1f}  "
        f"SPS={sps:,.0f}"
      )


if __name__ == "__main__":
  main()
