"""Box2D task registration (mirrors ``envpool/box2d/registration.py``)."""

from envpool_tpu.registration import register

register(
  task_id="LunarLander-v2",
  import_path="envpool_tpu.envs.box2d",
  spec_cls="LunarLanderEnvSpec",
  dm_cls="LunarLanderDMEnvPool",
  gym_cls="LunarLanderGymEnvPool",
  gymnasium_cls="LunarLanderGymnasiumEnvPool",
  max_episode_steps=1000,
)

register(
  task_id="LunarLanderContinuous-v2",
  import_path="envpool_tpu.envs.box2d",
  spec_cls="LunarLanderContinuousEnvSpec",
  dm_cls="LunarLanderContinuousDMEnvPool",
  gym_cls="LunarLanderContinuousGymEnvPool",
  gymnasium_cls="LunarLanderContinuousGymnasiumEnvPool",
  max_episode_steps=1000,
)
