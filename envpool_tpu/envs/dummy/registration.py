"""Dummy task registration (dev/test fixture)."""

from envpool_tpu.registration import register

register(
  task_id="Dummy-v0",
  import_path="envpool_tpu.envs.dummy",
  spec_cls="DummyEnvSpec",
  dm_cls="DummyDMEnvPool",
  gym_cls="DummyGymEnvPool",
  gymnasium_cls="DummyGymnasiumEnvPool",
  max_episode_steps=200,
)
