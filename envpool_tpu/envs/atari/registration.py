"""Atari task registration (``envpool/atari/registration.py``).

Task ids are generated from the ALE rom registry ("pong" -> "Pong-v5"),
like the reference generates them from its bundled roms directory.

The on-device parity-demo track (SURVEY §7.8(b)) registers first and
unconditionally — it has no emulator dependency.
"""

from envpool_tpu.registration import register

register(
  task_id="PongJaxDemo-v5",
  import_path="envpool_tpu.envs.atari",
  spec_cls="PongDemoEnvSpec",
  dm_cls="PongDemoDMEnvPool",
  gym_cls="PongDemoGymEnvPool",
  gymnasium_cls="PongDemoGymnasiumEnvPool",
  max_episode_steps=27000,
)


def _game_list():
  try:
    import ale_py.roms
  except ImportError:
    return []  # emulator tier gated on the optional wheel; demo stays
  get_all = getattr(ale_py.roms, "get_all_rom_ids", None)
  if get_all is not None:
    return sorted(get_all())
  return sorted(
    n for n in dir(ale_py.roms) if not n.startswith("_") and n.islower()
  )


for game in _game_list():
  name = "".join(g.capitalize() for g in game.split("_"))
  register(
    task_id=name + "-v5",
    import_path="envpool_tpu.envs.atari",
    spec_cls="AtariEnvSpec",
    dm_cls="AtariDMEnvPool",
    gym_cls="AtariGymEnvPool",
    gymnasium_cls="AtariGymnasiumEnvPool",
    task=game,
    max_episode_steps=27000,
  )
