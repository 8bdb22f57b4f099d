"""MJCF construction for sim2sim validation against MuJoCo.

Builds an equivalent MuJoCo model from a parsed URDF spec (same numbers,
quaternions derived from the same rpy->R conversion to sidestep
euler-convention ambiguity). Used by the MuJoCo golden-value tests and the
sim2sim evaluation (ref: evaluate_sim2sim.py, hopper.xml).

The MJCF is emitted from the COMPOSED ``RobotModel`` (fixed-joint subtrees
merged into their moving parent, same collapse as the simulator itself and
Isaac Gym's importer) with the true nested body topology — a flat export of
raw link inertials drops the mass of fixed links (e.g. 46 of ANYmal-C's
52 kg live on fixed links) and mis-places chained joints.
"""
from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation

from .dynamics import PRISMATIC, RobotModel
from .urdf import RobotSpec


def build_mjcf(spec: RobotSpec, timestep: float = 0.005) -> str:
    return build_mjcf_from_model(RobotModel.from_spec(spec),
                                 timestep=timestep)


def _quat_wxyz(R) -> str:
    q = Rotation.from_matrix(np.asarray(R)).as_quat()
    return f"{q[3]} {q[0]} {q[1]} {q[2]}"


def _inertial_xml(model: RobotModel, b: int) -> str:
    com = np.asarray(model.com[b])
    I = np.asarray(model.inertia[b])
    return (f'<inertial pos="{com[0]} {com[1]} {com[2]}" '
            f'mass="{float(model.mass[b])}" '
            f'fullinertia="{I[0,0]} {I[1,1]} {I[2,2]} '
            f'{I[0,1]} {I[0,2]} {I[1,2]}"/>')


def build_mjcf_from_model(model: RobotModel, timestep: float = 0.005) -> str:
    """Nested-body MJCF mirroring the composed articulated tree."""
    children = [[] for _ in range(model.nb)]
    for j in range(model.nj):
        children[model.parent[j]].append(j + 1)

    def body_xml(b: int) -> str:
        j = b - 1
        pos = np.asarray(model.origin_pos[j])
        ax = np.asarray(model.axis[j])
        jtype = "slide" if model.jtype[j] == PRISMATIC else "hinge"
        name = (model.body_names[b] if model.body_names
                else f"body_{b}")
        jname = model.dof_names[j]
        inner = "\n".join(body_xml(c) for c in children[b])
        return (
            f'<body name="{name}" pos="{pos[0]} {pos[1]} {pos[2]}" '
            f'quat="{_quat_wxyz(model.origin_rot[j])}">\n'
            f'<joint name="{jname}" type="{jtype}" '
            f'axis="{ax[0]} {ax[1]} {ax[2]}" limited="false"/>\n'
            f'{_inertial_xml(model, b)}\n{inner}\n</body>'
        )

    root_name = model.body_names[0] if model.body_names else "base"
    inner = "\n".join(body_xml(c) for c in children[0])
    g = np.asarray(model.gravity)
    return f"""<mujoco><option gravity="{g[0]} {g[1]} {g[2]}" timestep="{timestep}"/>
    <worldbody><body name="{root_name}" pos="0 0 0">
      <freejoint/>
      {_inertial_xml(model, 0)}
      {inner}
    </body></worldbody></mujoco>"""
