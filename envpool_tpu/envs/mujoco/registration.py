"""MuJoCo gym task registration (``envpool/mujoco/gym/registration.py``)."""

from envpool_tpu.registration import register

gym_mujoco_envs = [
  ("Ant", "v3", False, 1000),
  ("Ant", "v4", True, 1000),
  ("HalfCheetah", "v3", False, 1000),
  ("HalfCheetah", "v4", True, 1000),
  ("Hopper", "v3", False, 1000),
  ("Hopper", "v4", True, 1000),
  ("Humanoid", "v3", False, 1000),
  ("Humanoid", "v4", True, 1000),
  ("HumanoidStandup", "v2", False, 1000),
  ("HumanoidStandup", "v4", True, 1000),
  ("InvertedDoublePendulum", "v2", False, 1000),
  ("InvertedDoublePendulum", "v4", True, 1000),
  ("InvertedPendulum", "v2", False, 1000),
  ("InvertedPendulum", "v4", True, 1000),
  ("Pusher", "v2", False, 100),
  ("Pusher", "v4", True, 100),
  ("Reacher", "v2", False, 50),
  ("Reacher", "v4", True, 50),
  ("Swimmer", "v3", False, 1000),
  ("Swimmer", "v4", True, 1000),
  ("Walker2d", "v3", False, 1000),
  ("Walker2d", "v4", True, 1000),
]

for task, version, post_constraint, max_episode_steps in gym_mujoco_envs:
  extra_args = {}
  if task in ["Ant", "Humanoid"] and version == "v3":
    extra_args["use_contact_force"] = True
  register(
    task_id=f"{task}-{version}",
    import_path="envpool_tpu.envs.mujoco",
    spec_cls=f"Gym{task}EnvSpec",
    dm_cls=f"Gym{task}DMEnvPool",
    gym_cls=f"Gym{task}GymEnvPool",
    gymnasium_cls=f"Gym{task}GymnasiumEnvPool",
    post_constraint=post_constraint,
    max_episode_steps=max_episode_steps,
    **extra_args,
  )
