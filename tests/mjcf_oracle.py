"""Build a MuJoCo model from a RobotModel spec — independent oracle for the
JAX kinodynamics layer (MuJoCo is a separate implementation of rigid-body
dynamics; agreement on mass matrix / CoM / Jacobians / momentum validates
ours)."""

from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation

import mujoco

from ironcub_mpc_tpu.dynamics.model import RobotModel


def _quat(R):
    q = Rotation.from_matrix(R).as_quat()  # x,y,z,w
    return f"{q[3]} {q[0]} {q[1]} {q[2]}"


def mjcf_from_model(model: RobotModel) -> str:
    children = {i: [] for i in range(model.n_links)}
    for i, p in enumerate(model.parent_link):
        if p >= 0:
            children[p].append(i)

    frames_of_link = {}
    for name, fr in model.frames.items():
        frames_of_link.setdefault(fr.link, []).append((name, fr))

    def body_xml(i, indent):
        pad = "  " * indent
        name = model.link_names[i]
        pos = model.origin_p[i]
        quat = _quat(model.origin_R[i])
        s = f'{pad}<body name="{name}" pos="{pos[0]} {pos[1]} {pos[2]}" quat="{quat}">\n'
        if i == 0:
            s += f'{pad}  <freejoint name="base"/>\n'
        j = model.joint_of_link[i]
        if j >= 0:
            a = model.joint_axis[i]
            s += (f'{pad}  <joint name="{model.joint_names[j]}" type="hinge" '
                  f'axis="{a[0]} {a[1]} {a[2]}" pos="0 0 0"/>\n')
        m = max(model.mass[i], 1e-9)
        c = model.com[i]
        I = model.inertia[i]
        # mujoco wants principal inertia + orientation
        w, V = np.linalg.eigh(I + 1e-12 * np.eye(3))
        if np.linalg.det(V) < 0:
            V[:, 0] *= -1
        w = np.maximum(w, 1e-10)
        s += (f'{pad}  <inertial pos="{c[0]} {c[1]} {c[2]}" mass="{m}" '
              f'quat="{_quat(V)}" diaginertia="{w[0]} {w[1]} {w[2]}"/>\n')
        for fname, fr in frames_of_link.get(i, []):
            s += (f'{pad}  <site name="{fname}" pos="{fr.p[0]} {fr.p[1]} {fr.p[2]}" '
                  f'quat="{_quat(fr.R)}"/>\n')
        for ch in children[i]:
            s += body_xml(ch, indent + 1)
        s += f"{pad}</body>\n"
        return s

    return (
        '<mujoco model="oracle">\n'
        '  <option gravity="0 0 -9.81"/>\n'
        '  <compiler coordinate="local"/>\n'
        "  <worldbody>\n"
        + body_xml(0, 2)
        + "  </worldbody>\n</mujoco>\n")


def make_oracle(model: RobotModel):
    mj = mujoco.MjModel.from_xml_string(mjcf_from_model(model))
    data = mujoco.MjData(mj)
    return mj, data


def set_state(mj, data, model: RobotModel, base_R, base_p, q, base_vel=None,
              qd=None):
    """Set the MuJoCo state to (base pose, q) with our joint ordering."""
    data.qpos[:] = 0
    data.qpos[0:3] = base_p
    quat = Rotation.from_matrix(base_R).as_quat()
    data.qpos[3:7] = quat[[3, 0, 1, 2]]
    for j, name in enumerate(model.joint_names):
        adr = mj.jnt_qposadr[mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_JOINT, name)]
        data.qpos[adr] = q[j]
    data.qvel[:] = 0
    if qd is not None:
        for j, name in enumerate(model.joint_names):
            adr = mj.jnt_dofadr[mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_JOINT, name)]
            data.qvel[adr] = qd[j]
    if base_vel is not None:
        # mujoco free joint: linear world, angular in BODY frame
        data.qvel[0:3] = base_vel[0:3]
        data.qvel[3:6] = base_R.T @ base_vel[3:6]
    mujoco.mj_forward(mj, data)


def dof_permutation(mj, model: RobotModel):
    """Map our joint index -> mujoco dof index."""
    perm = []
    for name in model.joint_names:
        jid = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_JOINT, name)
        perm.append(mj.jnt_dofadr[jid])
    return np.asarray(perm)
