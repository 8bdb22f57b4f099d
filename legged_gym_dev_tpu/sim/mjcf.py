"""MJCF construction for sim2sim validation against MuJoCo.

Builds an equivalent MuJoCo model from a parsed URDF spec (same numbers,
quaternions derived from the same rpy->R conversion to sidestep
euler-convention ambiguity). Used by the MuJoCo golden-value tests and the
sim2sim evaluation (ref: evaluate_sim2sim.py, hopper.xml).
"""
from __future__ import annotations

from scipy.spatial.transform import Rotation

from .urdf import RobotSpec, _rpy_to_mat


def build_mjcf(spec: RobotSpec, timestep: float = 0.005) -> str:
    def quat_wxyz(R):
        q = Rotation.from_matrix(R).as_quat()
        return f"{q[3]} {q[0]} {q[1]} {q[2]}"

    def body_xml(j, jtype):
        R = _rpy_to_mat(j.origin_rpy)
        l = spec.links[j.child]
        d = l.inertia
        return f"""<body name="{j.child}" pos="{j.origin_pos[0]} {j.origin_pos[1]} {j.origin_pos[2]}" quat="{quat_wxyz(R)}">
          <joint name="{j.name}" type="{jtype}" axis="{j.axis[0]} {j.axis[1]} {j.axis[2]}" limited="false"/>
          <inertial pos="{l.com[0]} {l.com[1]} {l.com[2]}" mass="{l.mass}" fullinertia="{d[0,0]} {d[1,1]} {d[2,2]} {d[0,1]} {d[0,2]} {d[1,2]}"/>
        </body>"""

    root = spec.links[spec.root]
    ti = root.inertia
    joints_xml = "\n".join(
        body_xml(j, "hinge" if j.joint_type == "revolute" else "slide")
        for j in spec.joints if j.joint_type != "fixed"
    )
    return f"""<mujoco><option gravity="0 0 -9.81" timestep="{timestep}"/>
    <worldbody><body name="{spec.root}" pos="0 0 0">
      <freejoint/>
      <inertial pos="0 0 0" mass="{root.mass}" fullinertia="{ti[0,0]} {ti[1,1]} {ti[2,2]} {ti[0,1]} {ti[0,2]} {ti[1,2]}"/>
      {joints_xml}
    </body></worldbody></mujoco>"""
