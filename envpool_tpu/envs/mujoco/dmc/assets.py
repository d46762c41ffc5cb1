"""MJCF models for the dm_control-suite domains.

dm_control is not installed in this environment, so these are from-scratch
MJCF replicas keeping the task-relevant structure of the suite models
(joint topology, actuation gearing, named geoms/sensors the task logic
reads, timesteps); purely visual elements (materials, skybox, cameras)
are omitted. Task logic in ``domains.py`` follows the reference headers
exactly, so behavior is faithful up to these model replicas.
"""

PENDULUM_XML = """
<mujoco model="pendulum">
  <option timestep="0.02">
    <flag contact="disable"/>
  </option>
  <worldbody>
    <body name="pole" pos="0 0 0.6">
      <joint name="hinge" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom name="pole" type="capsule" fromto="0 0 0 0 0 0.5"
            size="0.045" mass="1"/>
    </body>
  </worldbody>
  <actuator>
    <motor name="torque" joint="hinge" gear="2" ctrllimited="true"
           ctrlrange="-1 1"/>
  </actuator>
</mujoco>
"""

_CARTPOLE_TMPL = """
<mujoco model="cart-pole">
  <option timestep="0.01"/>
  <worldbody>
    <geom name="floor" type="plane" pos="0 0 -0.05" size="4 4 0.2"
          contype="0" conaffinity="0"/>
    <geom name="rail1" type="capsule" pos="0 0.07 1" zaxis="1 0 0"
          size="0.02 2" contype="0" conaffinity="0"/>
    <geom name="rail2" type="capsule" pos="0 -0.07 1" zaxis="1 0 0"
          size="0.02 2" contype="0" conaffinity="0"/>
    <body name="cart" pos="0 0 1">
      <joint name="slider" type="slide" limited="true" axis="1 0 0"
             range="-1.8 1.8" solreflimit="0.08 1"/>
      <geom name="cart" type="box" size="0.2 0.15 0.1" mass="1"/>
      {poles}
    </body>
  </worldbody>
  <actuator>
    <motor name="slide" joint="slider" gear="10" ctrllimited="true"
           ctrlrange="-1 1"/>
  </actuator>
</mujoco>
"""

_POLE_TMPL = """
<body name="pole_{i}" pos="0 0 {z}">
  <joint name="hinge_{i}" type="hinge" axis="0 1 0"/>
  <geom name="pole_{i}" type="capsule" fromto="0 0 0 0 0 {length}"
        size="0.045" mass="{mass}"/>
{inner}
</body>
"""


def cartpole_xml(task_name: str) -> str:
  """Counterpart of GetCartpoleXML + XMLAddPoles (dmc/cartpole.h:39-48,
  dmc/utils.cc XMLAddPoles): chain n poles, each scaled 1/n."""
  n = {"two_poles": 2, "three_poles": 3}.get(task_name, 1)
  length = 1.0 / n
  mass = 0.1 / n
  inner = ""
  for i in range(n, 0, -1):
    inner = _POLE_TMPL.format(
      i=i, z=0 if i == 1 else length, length=length, mass=mass, inner=inner
    )
  return _CARTPOLE_TMPL.format(poles=inner)


POINT_MASS_XML = """
<mujoco model="point_mass">
  <option timestep="0.02"/>
  <worldbody>
    <geom name="ground" type="plane" pos="0 0 0" size="0.3 0.3 0.1"/>
    <geom name="target" pos="0 0 0.01" type="sphere" size="0.015"
          contype="0" conaffinity="0"/>
    <body name="pointmass" pos="0 0 0.01">
      <joint name="root_x" type="slide" axis="1 0 0" limited="true"
             range="-0.29 0.29"/>
      <joint name="root_y" type="slide" axis="0 1 0" limited="true"
             range="-0.29 0.29"/>
      <geom name="pointmass" type="sphere" size="0.01" mass="0.3"/>
    </body>
  </worldbody>
  <tendon>
    <fixed name="t1">
      <joint joint="root_x" coef="1"/>
      <joint joint="root_y" coef="0"/>
    </fixed>
    <fixed name="t2">
      <joint joint="root_x" coef="0"/>
      <joint joint="root_y" coef="1"/>
    </fixed>
  </tendon>
  <actuator>
    <motor name="t1" tendon="t1" gear="0.1" ctrllimited="true"
           ctrlrange="-1 1"/>
    <motor name="t2" tendon="t2" gear="0.1" ctrllimited="true"
           ctrlrange="-1 1"/>
  </actuator>
</mujoco>
"""

REACHER_XML = """
<mujoco model="reacher">
  <option timestep="0.02">
    <flag contact="disable"/>
  </option>
  <worldbody>
    <geom name="ground" type="plane" pos="0 0 0" size="0.4 0.4 0.1"
          contype="0" conaffinity="0"/>
    <geom name="target" pos="0.1 0.1 0.01" type="sphere" size="0.05"
          contype="0" conaffinity="0"/>
    <body name="arm" pos="0 0 0.01">
      <joint name="shoulder" type="hinge" axis="0 0 1"/>
      <geom name="arm" type="capsule" fromto="0 0 0 0.12 0 0"
            size="0.01" mass="0.05"/>
      <body name="hand" pos="0.12 0 0">
        <joint name="wrist" type="hinge" axis="0 0 1" limited="true"
               range="-2.8 2.8"/>
        <geom name="hand" type="capsule" fromto="0 0 0 0.1 0 0"
              size="0.01" mass="0.05"/>
        <body name="finger_body" pos="0.12 0 0">
          <geom name="finger" type="sphere" size="0.01" mass="0.01"/>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor name="shoulder" joint="shoulder" gear="0.05" ctrllimited="true"
           ctrlrange="-1 1"/>
    <motor name="wrist" joint="wrist" gear="0.05" ctrllimited="true"
           ctrlrange="-1 1"/>
  </actuator>
</mujoco>
"""

# planar cheetah: same topology as the suite model (rootx/rootz/rooty +
# 6 limited leg joints), with the torso subtreelinvel sensor the task reads
CHEETAH_XML = """
<mujoco model="cheetah">
  <compiler angle="radian" coordinate="local"/>
  <option timestep="0.01"/>
  <default>
    <joint armature="0.1" damping="0.01" limited="true" stiffness="8"/>
    <geom conaffinity="0" condim="3" contype="1" friction="0.4 0.1 0.1"/>
  </default>
  <worldbody>
    <geom name="ground" type="plane" conaffinity="1" pos="0 0 0"
          size="60 5 0.2" friction="0.4 0.1 0.1"/>
    <body name="torso" pos="0 0 0.7">
      <joint name="rootx" type="slide" axis="1 0 0" limited="false"
             armature="0" damping="0" stiffness="0"/>
      <joint name="rootz" type="slide" axis="0 0 1" limited="false"
             armature="0" damping="0" stiffness="0"/>
      <joint name="rooty" type="hinge" axis="0 1 0" limited="false"
             armature="0" damping="0" stiffness="0"/>
      <geom name="torso" type="capsule" fromto="-0.5 0 0 0.5 0 0"
            size="0.046"/>
      <geom name="head" type="capsule" pos="0.6 0 0.1" axisangle="0 1 0 0.87"
            size="0.046 0.075"/>
      <body name="bthigh" pos="-0.5 0 0">
        <joint name="bthigh" type="hinge" axis="0 1 0" damping="6"
               range="-0.52 1.05" stiffness="240"/>
        <geom name="bthigh" type="capsule" pos="0.1 0 -0.13"
              axisangle="0 1 0 -3.8" size="0.046 0.145"/>
        <body name="bshin" pos="0.16 0 -0.25">
          <joint name="bshin" type="hinge" axis="0 1 0" damping="4.5"
                 range="-0.785 0.785" stiffness="180"/>
          <geom name="bshin" type="capsule" pos="-0.14 0 -0.07"
                axisangle="0 1 0 -2.03" size="0.046 0.15"/>
          <body name="bfoot" pos="-0.28 0 -0.14">
            <joint name="bfoot" type="hinge" axis="0 1 0" damping="3"
                   range="-0.4 0.785" stiffness="120"/>
            <geom name="bfoot" type="capsule" pos="0.03 0 -0.097"
                  axisangle="0 1 0 -0.27" size="0.046 0.094"/>
          </body>
        </body>
      </body>
      <body name="fthigh" pos="0.5 0 0">
        <joint name="fthigh" type="hinge" axis="0 1 0" damping="4.5"
               range="-1 0.7" stiffness="180"/>
        <geom name="fthigh" type="capsule" pos="-0.07 0 -0.12"
              axisangle="0 1 0 0.52" size="0.046 0.133"/>
        <body name="fshin" pos="-0.14 0 -0.24">
          <joint name="fshin" type="hinge" axis="0 1 0" damping="3"
                 range="-1.2 0.87" stiffness="120"/>
          <geom name="fshin" type="capsule" pos="0.065 0 -0.09"
                axisangle="0 1 0 -0.6" size="0.046 0.106"/>
          <body name="ffoot" pos="0.13 0 -0.18">
            <joint name="ffoot" type="hinge" axis="0 1 0" damping="1.5"
                   range="-0.5 0.5" stiffness="60"/>
            <geom name="ffoot" type="capsule" pos="0.045 0 -0.07"
                  axisangle="0 1 0 -0.6" size="0.046 0.07"/>
          </body>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor name="bthigh" joint="bthigh" gear="120" ctrllimited="true"
           ctrlrange="-1 1"/>
    <motor name="bshin" joint="bshin" gear="90" ctrllimited="true"
           ctrlrange="-1 1"/>
    <motor name="bfoot" joint="bfoot" gear="60" ctrllimited="true"
           ctrlrange="-1 1"/>
    <motor name="fthigh" joint="fthigh" gear="120" ctrllimited="true"
           ctrlrange="-1 1"/>
    <motor name="fshin" joint="fshin" gear="60" ctrllimited="true"
           ctrlrange="-1 1"/>
    <motor name="ffoot" joint="ffoot" gear="30" ctrllimited="true"
           ctrlrange="-1 1"/>
  </actuator>
  <sensor>
    <subtreelinvel name="torso_subtreelinvel" body="torso"/>
  </sensor>
</mujoco>
"""

ACROBOT_XML = """
<mujoco model="acrobot">
  <option timestep="0.01">
    <flag contact="disable"/>
  </option>
  <default>
    <joint damping="0.05"/>
  </default>
  <worldbody>
    <site name="target" pos="0 0 4" size="0.1"/>
    <body name="upper_arm" pos="0 0 2">
      <joint name="shoulder" type="hinge" axis="0 1 0"/>
      <geom name="upper_arm" type="capsule" fromto="0 0 0 0 0 1"
            size="0.049" mass="1"/>
      <body name="lower_arm" pos="0 0 1">
        <joint name="elbow" type="hinge" axis="0 1 0"/>
        <geom name="lower_arm" type="capsule" fromto="0 0 0 0 0 1"
              size="0.049" mass="1"/>
        <site name="tip" pos="0 0 1" size="0.01"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor name="elbow" joint="elbow" gear="2" ctrllimited="true"
           ctrlrange="-1 1"/>
  </actuator>
</mujoco>
"""

BALL_IN_CUP_XML = """
<mujoco model="ball_in_cup">
  <option timestep="0.002"/>
  <worldbody>
    <body name="cup" pos="0 0 0.6">
      <joint name="cup_x" type="slide" axis="1 0 0" limited="true"
             range="-0.4 0.4" damping="2"/>
      <joint name="cup_z" type="slide" axis="0 0 1" limited="true"
             range="-0.3 0.3" damping="2"/>
      <geom name="cup_left" type="capsule" fromto="-0.05 0 0 -0.05 0 0.1"
            size="0.008" mass="0.2"/>
      <geom name="cup_right" type="capsule" fromto="0.05 0 0 0.05 0 0.1"
            size="0.008" mass="0.2"/>
      <geom name="cup_bottom" type="capsule" fromto="-0.05 0 0 0.05 0 0"
            size="0.008" mass="0.2"/>
      <site name="cup_anchor" pos="0 0 0" size="0.005"/>
      <site name="target" pos="0 0 0.05" size="0.04 0.001 0.04"
            type="box"/>
    </body>
    <body name="ball" pos="0 0 0.2">
      <joint name="ball_x" type="slide" axis="1 0 0"/>
      <joint name="ball_z" type="slide" axis="0 0 1"/>
      <geom name="ball" type="sphere" size="0.025" mass="0.06"/>
      <site name="ball_site" pos="0 0 0" size="0.005"/>
    </body>
  </worldbody>
  <tendon>
    <spatial name="string" limited="true" range="0 0.3" width="0.002">
      <site site="cup_anchor"/>
      <site site="ball_site"/>
    </spatial>
  </tendon>
  <actuator>
    <motor name="cup_x" joint="cup_x" gear="1" ctrllimited="true"
           ctrlrange="-1 1"/>
    <motor name="cup_z" joint="cup_z" gear="1" ctrllimited="true"
           ctrlrange="-1 1"/>
  </actuator>
</mujoco>
"""

DMC_HOPPER_XML = """
<mujoco model="hopper">
  <option timestep="0.005"/>
  <default>
    <joint damping="0.1" armature="0.2" limited="true"/>
    <geom friction="0.7 0.1 0.1"/>
  </default>
  <worldbody>
    <geom name="floor" type="plane" pos="0 0 0" size="40 1 0.1"/>
    <body name="torso" pos="0 0 1">
      <joint name="rootx" type="slide" axis="1 0 0" limited="false"
             damping="0" armature="0"/>
      <joint name="rootz" type="slide" axis="0 0 1" limited="false"
             damping="0" armature="0"/>
      <joint name="rooty" type="hinge" axis="0 1 0" limited="false"
             damping="0" armature="0"/>
      <geom name="torso" type="capsule" fromto="0 0 -0.05 0 0 0.2"
            size="0.0653"/>
      <body name="pelvis" pos="0 0 -0.05">
        <joint name="waist" type="hinge" axis="0 1 0" range="-0.5 0.5"/>
        <geom name="pelvis" type="capsule" fromto="0 0 0 0 0 -0.2"
              size="0.055"/>
        <body name="thigh" pos="0 0 -0.2">
          <joint name="hip" type="hinge" axis="0 1 0" range="-2.5 1.6"/>
          <geom name="thigh" type="capsule" fromto="0 0 0 0 0 -0.33"
                size="0.04"/>
          <body name="calf" pos="0 0 -0.33">
            <joint name="knee" type="hinge" axis="0 1 0" range="0.05 2.6"/>
            <geom name="calf" type="capsule" fromto="0 0 0 0 0 -0.32"
                  size="0.03"/>
            <body name="foot" pos="0 0 -0.32">
              <joint name="ankle" type="hinge" axis="0 1 0"
                     range="-1 1"/>
              <geom name="foot" type="capsule"
                    fromto="-0.08 0 -0.04 0.17 0 -0.04" size="0.03"/>
              <site name="toe_site" pos="0.17 0 -0.04" size="0.01"/>
              <site name="heel_site" pos="-0.08 0 -0.04" size="0.01"/>
            </body>
          </body>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor name="waist" joint="waist" gear="30" ctrllimited="true"
           ctrlrange="-1 1"/>
    <motor name="hip" joint="hip" gear="40" ctrllimited="true"
           ctrlrange="-1 1"/>
    <motor name="knee" joint="knee" gear="30" ctrllimited="true"
           ctrlrange="-1 1"/>
    <motor name="ankle" joint="ankle" gear="10" ctrllimited="true"
           ctrlrange="-1 1"/>
  </actuator>
  <sensor>
    <subtreelinvel name="torso_subtreelinvel" body="torso"/>
    <touch name="touch_toe" site="toe_site"/>
    <touch name="touch_heel" site="heel_site"/>
  </sensor>
</mujoco>
"""

DMC_WALKER_XML = """
<mujoco model="planar walker">
  <option timestep="0.0025"/>
  <default>
    <joint damping="0.1" armature="0.01" limited="true"/>
    <geom friction="0.7 0.1 0.1"/>
  </default>
  <worldbody>
    <geom name="floor" type="plane" pos="0 0 0" size="40 1 0.1"/>
    <body name="torso" pos="0 0 1.3">
      <joint name="rootx" type="slide" axis="1 0 0" limited="false"
             damping="0" armature="0"/>
      <joint name="rootz" type="slide" axis="0 0 1" limited="false"
             damping="0" armature="0"/>
      <joint name="rooty" type="hinge" axis="0 1 0" limited="false"
             damping="0" armature="0"/>
      <geom name="torso" type="capsule" fromto="0 0 -0.3 0 0 0.3"
            size="0.07"/>
      <body name="right_thigh" pos="0 -0.05 -0.3">
        <joint name="right_hip" type="hinge" axis="0 1 0"
               range="-0.35 1.05"/>
        <geom name="right_thigh" type="capsule" fromto="0 0 0 0 0 -0.3"
              size="0.05"/>
        <body name="right_leg" pos="0 0 -0.3">
          <joint name="right_knee" type="hinge" axis="0 1 0"
                 range="-2.6 0"/>
          <geom name="right_leg" type="capsule" fromto="0 0 0 0 0 -0.25"
                size="0.04"/>
          <body name="right_foot" pos="0 0 -0.25">
            <joint name="right_ankle" type="hinge" axis="0 1 0"
                   range="-0.8 0.8"/>
            <geom name="right_foot" type="capsule"
                  fromto="-0.05 0 -0.05 0.15 0 -0.05" size="0.04"/>
          </body>
        </body>
      </body>
      <body name="left_thigh" pos="0 0.05 -0.3">
        <joint name="left_hip" type="hinge" axis="0 1 0"
               range="-0.35 1.05"/>
        <geom name="left_thigh" type="capsule" fromto="0 0 0 0 0 -0.3"
              size="0.05"/>
        <body name="left_leg" pos="0 0 -0.3">
          <joint name="left_knee" type="hinge" axis="0 1 0"
                 range="-2.6 0"/>
          <geom name="left_leg" type="capsule" fromto="0 0 0 0 0 -0.25"
                size="0.04"/>
          <body name="left_foot" pos="0 0 -0.25">
            <joint name="left_ankle" type="hinge" axis="0 1 0"
                   range="-0.8 0.8"/>
            <geom name="left_foot" type="capsule"
                  fromto="-0.05 0 -0.05 0.15 0 -0.05" size="0.04"/>
          </body>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor name="right_hip" joint="right_hip" gear="100" ctrllimited="true"
           ctrlrange="-1 1"/>
    <motor name="right_knee" joint="right_knee" gear="50" ctrllimited="true"
           ctrlrange="-1 1"/>
    <motor name="right_ankle" joint="right_ankle" gear="20"
           ctrllimited="true" ctrlrange="-1 1"/>
    <motor name="left_hip" joint="left_hip" gear="100" ctrllimited="true"
           ctrlrange="-1 1"/>
    <motor name="left_knee" joint="left_knee" gear="50" ctrllimited="true"
           ctrlrange="-1 1"/>
    <motor name="left_ankle" joint="left_ankle" gear="20" ctrllimited="true"
           ctrlrange="-1 1"/>
  </actuator>
  <sensor>
    <subtreelinvel name="torso_subtreelinvel" body="torso"/>
  </sensor>
</mujoco>
"""

FINGER_XML = """
<mujoco model="finger">
  <option timestep="0.01"/>
  <default>
    <joint damping="0.1"/>
    <geom friction="1 0.005 0.001"/>
  </default>
  <worldbody>
    <body name="proximal_body" pos="0 0 0.7">
      <joint name="proximal" type="hinge" axis="0 1 0" limited="true"
             range="-1.92 1.92" damping="2.5"/>
      <geom name="proximal_geom" type="capsule" fromto="0 0 0 0 0 -0.17"
            size="0.03"/>
      <body name="distal_body" pos="0 0 -0.17">
        <joint name="distal" type="hinge" axis="0 1 0" limited="true"
               range="-1.1 1.1" damping="2.5"/>
        <geom name="distal_geom" type="capsule" fromto="0 0 0 0 0 -0.16"
              size="0.028"/>
        <geom name="fingertip" type="capsule"
              fromto="0 0 -0.16 0 0 -0.19" size="0.03"/>
        <site name="touchtop_site" pos="0.01 0 -0.17" size="0.01"/>
        <site name="touchbottom_site" pos="-0.01 0 -0.21" size="0.01"/>
        <site name="tip" pos="0 0 -0.19" size="0.01"/>
      </body>
    </body>
    <body name="spinner" pos="0.2 0 0.4">
      <joint name="hinge" type="hinge" axis="0 1 0" damping="0.5"/>
      <geom name="cap1" type="capsule" fromto="0 0 -0.13 0 0 0.13"
            size="0.02" mass="0.1"/>
      <site name="spinner_site" pos="0 0 0" size="0.005"/>
      <site name="spintip" pos="0 0 0.13" size="0.01"/>
    </body>
    <site name="target" pos="0.2 0 0.55" size="0.07"/>
  </worldbody>
  <actuator>
    <motor name="proximal" joint="proximal" gear="3" ctrllimited="true"
           ctrlrange="-1 1"/>
    <motor name="distal" joint="distal" gear="1.5" ctrllimited="true"
           ctrlrange="-1 1"/>
  </actuator>
  <sensor>
    <jointpos name="proximal" joint="proximal"/>
    <jointpos name="distal" joint="distal"/>
    <jointvel name="proximal_velocity" joint="proximal"/>
    <jointvel name="distal_velocity" joint="distal"/>
    <jointvel name="hinge_velocity" joint="hinge"/>
    <framepos name="tip" objtype="site" objname="tip"/>
    <framepos name="target" objtype="site" objname="target"/>
    <framepos name="spinner" objtype="site" objname="spinner_site"/>
    <touch name="touchtop" site="touchtop_site"/>
    <touch name="touchbottom" site="touchbottom_site"/>
  </sensor>
</mujoco>
"""


def swimmer_xml(task_name: str) -> str:
  """Counterpart of XMLMakeSwimmer (dmc/utils.cc:75-160): an n-link chain
  in a viscous fluid, per-link velocimeter+gyro, nose/target geoms."""
  n = {"swimmer6": 6, "swimmer15": 15}.get(task_name, 3)
  joint_range = 360.0 / n
  body = ""
  for i in range(n - 2, -1, -1):
    body = f"""
      <body name="segment_{i}" pos="0 .1 0">
        <joint name="joint_{i}" type="hinge" axis="0 0 1" limited="true"
               range="-{joint_range} {joint_range}"/>
        <geom name="visual_{i}" type="capsule" fromto="0 0 0 0 0.1 0"
              size="0.01"/>
        <site name="site_{i}" pos="0 0.05 0" size="0.005"/>
        {body}
      </body>"""
  actuators = "\n".join(
    f'    <motor name="motor_{i}" joint="joint_{i}" gear="5e-4"'
    f' ctrllimited="true" ctrlrange="-1 1"/>' for i in range(n - 1)
  )
  sensors = "\n".join(
    f'    <velocimeter name="velocimeter_{i}" site="site_{i}"/>\n'
    f'    <gyro name="gyro_{i}" site="site_{i}"/>'
    for i in range(n - 1)
  )
  return f"""
<mujoco model="swimmer">
  <compiler angle="degree"/>
  <option timestep="0.002" density="4000" viscosity="0.1">
    <flag contact="disable"/>
  </option>
  <worldbody>
    <light name="target_light" pos="0 0 1"/>
    <geom name="target" type="sphere" pos="1 1 0.01" size="0.04"
          contype="0" conaffinity="0"/>
    <body name="head" pos="0 0 0.01">
      <joint name="rootx" type="slide" axis="1 0 0"/>
      <joint name="rooty" type="slide" axis="0 1 0"/>
      <joint name="rootz" type="hinge" axis="0 0 1"/>
      <geom name="head_geom" type="capsule" fromto="0 0 0 0 0.05 0"
            size="0.012"/>
      <geom name="nose" type="sphere" pos="0 -0.02 0" size="0.008"/>
      <site name="head_site" pos="0 0 0" size="0.005"/>
      {body}
    </body>
  </worldbody>
  <actuator>
{actuators}
  </actuator>
  <sensor>
    <velocimeter name="velocimeter_head" site="head_site"/>
    <gyro name="gyro_head" site="head_site"/>
{sensors}
  </sensor>
</mujoco>"""
