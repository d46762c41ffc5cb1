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


# dm_control suite subset (``envpool/mujoco/dmc/registration.py``); the
# remaining suite domains land with their MJCF replicas in later revisions.
dmc_mujoco_envs = [
  ("acrobot", "swingup", 1000),
  ("acrobot", "swingup_sparse", 1000),
  ("ball_in_cup", "catch", 1000),
  ("hopper", "hop", 1000),
  ("hopper", "stand", 1000),
  ("walker", "run", 1000),
  ("walker", "stand", 1000),
  ("walker", "walk", 1000),
  ("cartpole", "balance", 1000),
  ("cartpole", "balance_sparse", 1000),
  ("cartpole", "swingup", 1000),
  ("cartpole", "swingup_sparse", 1000),
  ("cartpole", "three_poles", 1000),
  ("cartpole", "two_poles", 1000),
  ("cheetah", "run", 1000),
  ("finger", "spin", 1000),
  ("fish", "swim", 1000),
  ("fish", "upright", 1000),
  ("humanoid", "run", 1000),
  ("humanoid_CMU", "run", 1000),
  ("humanoid_CMU", "stand", 1000),
  ("humanoid", "run_pure_state", 1000),
  ("humanoid", "stand", 1000),
  ("humanoid", "walk", 1000),
  ("finger", "turn_easy", 1000),
  ("finger", "turn_hard", 1000),
  ("swimmer", "swimmer6", 1000),
  ("swimmer", "swimmer15", 1000),
  ("manipulator", "bring_ball", 1000),
  ("manipulator", "bring_peg", 1000),
  ("manipulator", "insert_ball", 1000),
  ("manipulator", "insert_peg", 1000),
  ("pendulum", "swingup", 1000),
  ("point_mass", "easy", 1000),
  ("point_mass", "hard", 1000),
  ("reacher", "easy", 1000),
  ("reacher", "hard", 1000),
]

# on-device (pure-JAX physics) tier — the contact-free gym tasks
for task, max_episode_steps in [
  ("Reacher", 50),
  ("InvertedPendulum", 1000),
  ("InvertedDoublePendulum", 1000),
  ("Swimmer", 1000),
  ("HalfCheetah", 1000),
  ("Hopper", 1000),
  ("Walker2d", 1000),
  ("Ant", 1000),
  ("Humanoid", 1000),
  ("HumanoidStandup", 1000),
  ("Pusher", 100),
]:
  register(
    task_id=f"{task}Jax-v4",
    import_path="envpool_tpu.envs.mujoco",
    spec_cls=f"{task}JaxEnvSpec",
    dm_cls=f"{task}JaxDMEnvPool",
    gym_cls=f"{task}JaxGymEnvPool",
    gymnasium_cls=f"{task}JaxGymnasiumEnvPool",
    max_episode_steps=max_episode_steps,
  )

# on-device dm_control tier (pure-JAX physics over the same MJCF
# replicas); ids mirror the host tier's with a Jax suffix on the domain
dmc_device_envs = [
  ("acrobot", "swingup", 1000),
  ("ball_in_cup", "catch", 1000),
  ("humanoid", "stand", 1000),
  ("humanoid", "walk", 1000),
  ("humanoid", "run", 1000),
  ("humanoid", "run_pure_state", 1000),
  ("humanoid_CMU", "stand", 1000),
  ("humanoid_CMU", "run", 1000),
  ("manipulator", "bring_ball", 1000),
  ("manipulator", "bring_peg", 1000),
  ("manipulator", "insert_ball", 1000),
  ("manipulator", "insert_peg", 1000),
  ("acrobot", "swingup_sparse", 1000),
  ("cartpole", "balance", 1000),
  ("cartpole", "balance_sparse", 1000),
  ("cartpole", "swingup", 1000),
  ("cartpole", "swingup_sparse", 1000),
  ("cartpole", "two_poles", 1000),
  ("cartpole", "three_poles", 1000),
  ("cheetah", "run", 1000),
  ("finger", "spin", 1000),
  ("finger", "turn_easy", 1000),
  ("finger", "turn_hard", 1000),
  ("fish", "upright", 1000),
  ("fish", "swim", 1000),
  ("swimmer", "swimmer6", 1000),
  ("swimmer", "swimmer15", 1000),
  ("hopper", "stand", 1000),
  ("hopper", "hop", 1000),
  ("walker", "stand", 1000),
  ("walker", "walk", 1000),
  ("walker", "run", 1000),
  ("pendulum", "swingup", 1000),
  ("point_mass", "easy", 1000),
  ("point_mass", "hard", 1000),
  ("reacher", "easy", 1000),
  ("reacher", "hard", 1000),
]

for domain, task, max_episode_steps in dmc_device_envs:
  domain_name = "".join(g[:1].upper() + g[1:] for g in domain.split("_"))
  task_name = "".join(g[:1].upper() + g[1:] for g in task.split("_"))
  register(
    task_id=f"{domain_name}Jax{task_name}-v1",
    import_path="envpool_tpu.envs.mujoco.dmc",
    spec_cls=f"Dmc{domain_name}JaxEnvSpec",
    dm_cls=f"Dmc{domain_name}JaxDMEnvPool",
    gym_cls=f"Dmc{domain_name}JaxGymEnvPool",
    gymnasium_cls=f"Dmc{domain_name}JaxGymnasiumEnvPool",
    task_name=task,
    max_episode_steps=max_episode_steps,
  )

for domain, task, max_episode_steps in dmc_mujoco_envs:
  domain_name = "".join(g[:1].upper() + g[1:] for g in domain.split("_"))
  task_name = "".join(g[:1].upper() + g[1:] for g in task.split("_"))
  register(
    task_id=f"{domain_name}{task_name}-v1",
    import_path="envpool_tpu.envs.mujoco.dmc",
    spec_cls=f"Dmc{domain_name}EnvSpec",
    dm_cls=f"Dmc{domain_name}DMEnvPool",
    gym_cls=f"Dmc{domain_name}GymEnvPool",
    gymnasium_cls=f"Dmc{domain_name}GymnasiumEnvPool",
    task_name=task,
    max_episode_steps=max_episode_steps,
  )
