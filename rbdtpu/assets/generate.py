"""Generate the benchmark/test URDF assets.

The reference repo ships no robot models (its README points at the external
URDFParser + user-supplied URDFs, /root/reference/README.md:8).  These generated
models cover the BASELINE.json benchmark configs: a 7-DoF iiwa-class serial arm,
a 12-DoF quadruped, and a 30-DoF humanoid.  Inertias are physically consistent
(solid-cylinder links, positive-definite, COM offsets along the link).

Run:  python -m rbdtpu.assets.generate
"""
from __future__ import annotations

import os

HERE = os.path.dirname(__file__)


def _cyl_inertia(m, r, h):
    """Solid cylinder about its COM, axis z."""
    ixx = iyy = m * (3 * r * r + h * h) / 12.0
    izz = m * r * r / 2.0
    return ixx, iyy, izz


def link_xml(name, m, r, h, com=(0, 0, 0)):
    ixx, iyy, izz = _cyl_inertia(m, r, h)
    cx, cy, cz = com
    return f"""  <link name="{name}">
    <inertial>
      <origin xyz="{cx} {cy} {cz}" rpy="0 0 0"/>
      <mass value="{m}"/>
      <inertia ixx="{ixx:.6g}" ixy="0" ixz="0" iyy="{iyy:.6g}" iyz="0" izz="{izz:.6g}"/>
    </inertial>
  </link>
"""


def joint_xml(name, jtype, parent, child, xyz, rpy=(0, 0, 0), axis=(0, 0, 1),
              damping=0.1, lo=-2.96, hi=2.96, effort=300, vel=10):
    lim = (
        f'    <limit lower="{lo}" upper="{hi}" effort="{effort}" velocity="{vel}"/>\n'
        if jtype == "revolute"
        else ""
    )
    ax = (
        f'    <axis xyz="{axis[0]} {axis[1]} {axis[2]}"/>\n'
        if jtype != "fixed"
        else ""
    )
    return f"""  <joint name="{name}" type="{jtype}">
    <origin xyz="{xyz[0]} {xyz[1]} {xyz[2]}" rpy="{rpy[0]} {rpy[1]} {rpy[2]}"/>
    <parent link="{parent}"/>
    <child link="{child}"/>
{ax}{lim}    <dynamics damping="{damping}"/>
  </joint>
"""


def gen_arm7(path):
    """7-DoF iiwa-class serial arm: alternating z/y axes, tapered masses."""
    masses = [5.76, 6.35, 3.5, 3.5, 3.5, 1.8, 1.2]
    lengths = [0.1575, 0.2025, 0.2045, 0.2155, 0.1845, 0.2155, 0.081]
    radii = [0.06, 0.06, 0.05, 0.05, 0.04, 0.04, 0.03]
    axes = [(0, 0, 1), (0, 1, 0), (0, 0, 1), (0, -1, 0), (0, 0, 1), (0, 1, 0), (0, 0, 1)]
    parts = ['<?xml version="1.0"?>\n<robot name="arm7">\n', '  <link name="base"/>\n']
    prev = "base"
    for i in range(7):
        parts.append(
            link_xml(f"link{i + 1}", masses[i], radii[i], lengths[i],
                     com=(0, 0, lengths[i] / 2))
        )
        parts.append(
            joint_xml(f"joint{i + 1}", "revolute", prev, f"link{i + 1}",
                      xyz=(0, 0, lengths[i - 1] if i > 0 else 0.1), axis=axes[i])
        )
        prev = f"link{i + 1}"
    parts.append('  <link name="ee_link"/>\n')
    parts.append(
        joint_xml("ee_fixed_joint", "fixed", prev, "ee_link", xyz=(0, 0, 0.045))
    )
    parts.append("</robot>\n")
    with open(path, "w") as f:
        f.write("".join(parts))


def gen_quadruped(path):
    """12-DoF quadruped: floating trunk + 4 legs x (hip_roll, hip_pitch, knee)."""
    parts = ['<?xml version="1.0"?>\n<robot name="quadruped12">\n']
    parts.append(link_xml("trunk", 9.0, 0.12, 0.45))
    legs = {
        "FL": (0.19, 0.11), "FR": (0.19, -0.11),
        "RL": (-0.19, 0.11), "RR": (-0.19, -0.11),
    }
    for leg, (x, y) in legs.items():
        hip, thigh, calf = f"{leg}_hip", f"{leg}_thigh", f"{leg}_calf"
        parts.append(link_xml(hip, 0.7, 0.04, 0.06))
        parts.append(joint_xml(f"{leg}_hip_roll", "revolute", "trunk", hip,
                               xyz=(x, y, 0), axis=(1, 0, 0), lo=-0.9, hi=0.9))
        parts.append(link_xml(thigh, 1.0, 0.03, 0.2, com=(0, 0, -0.1)))
        parts.append(joint_xml(f"{leg}_hip_pitch", "revolute", hip, thigh,
                               xyz=(0, 0.08 if y > 0 else -0.08, 0), axis=(0, 1, 0),
                               lo=-1.6, hi=1.6))
        parts.append(link_xml(calf, 0.22, 0.02, 0.2, com=(0, 0, -0.1)))
        parts.append(joint_xml(f"{leg}_knee", "revolute", thigh, calf,
                               xyz=(0, 0, -0.2), axis=(0, 1, 0), lo=-2.7, hi=-0.6))
        parts.append(f'  <link name="{leg}_foot"/>\n')
        parts.append(joint_xml(f"{leg}_foot_fixed", "fixed", calf, f"{leg}_foot",
                               xyz=(0, 0, -0.2)))
    parts.append("</robot>\n")
    with open(path, "w") as f:
        f.write("".join(parts))


def gen_humanoid(path):
    """30-DoF humanoid: floating pelvis, 3-DoF waist, 2x7-DoF arms, 2x6-DoF legs,
    1-DoF neck."""
    parts = ['<?xml version="1.0"?>\n<robot name="humanoid30">\n']
    parts.append(link_xml("pelvis", 8.0, 0.12, 0.2))

    def chain(base, prefix, specs):
        prev = base
        for i, (jname, axis, xyz, m, r, h, com) in enumerate(specs):
            lname = f"{prefix}_{jname}_link"
            parts.append(link_xml(lname, m, r, h, com=com))
            parts.append(joint_xml(f"{prefix}_{jname}", "revolute", prev, lname,
                                   xyz=xyz, axis=axis, lo=-2.5, hi=2.5))
            prev = lname
        return prev

    # waist (3)
    torso_end = chain("pelvis", "waist", [
        ("yaw", (0, 0, 1), (0, 0, 0.1), 2.0, 0.08, 0.1, (0, 0, 0.05)),
        ("pitch", (0, 1, 0), (0, 0, 0.1), 2.0, 0.08, 0.1, (0, 0, 0.05)),
        ("roll", (1, 0, 0), (0, 0, 0.1), 12.0, 0.13, 0.3, (0, 0, 0.15)),
    ])
    # neck (1)
    chain(torso_end, "neck", [
        ("yaw", (0, 0, 1), (0, 0, 0.35), 2.0, 0.08, 0.15, (0, 0, 0.07)),
    ])
    # arms (2 x 7)
    for side, sy in (("left", 1), ("right", -1)):
        ee = chain(torso_end, f"{side}_arm", [
            ("shoulder_pitch", (0, 1, 0), (0, sy * 0.22, 0.3), 1.5, 0.05, 0.1, (0, 0, 0)),
            ("shoulder_roll", (1, 0, 0), (0, sy * 0.06, 0), 1.5, 0.05, 0.1, (0, 0, -0.05)),
            ("shoulder_yaw", (0, 0, 1), (0, 0, -0.1), 1.2, 0.04, 0.15, (0, 0, -0.07)),
            ("elbow", (0, 1, 0), (0, 0, -0.15), 1.0, 0.04, 0.12, (0, 0, -0.06)),
            ("wrist_yaw", (0, 0, 1), (0, 0, -0.15), 0.6, 0.03, 0.1, (0, 0, -0.05)),
            ("wrist_pitch", (0, 1, 0), (0, 0, -0.1), 0.4, 0.03, 0.05, (0, 0, 0)),
            ("wrist_roll", (1, 0, 0), (0, 0, -0.05), 0.3, 0.03, 0.05, (0, 0, 0)),
        ])
        parts.append(f'  <link name="{side}_hand"/>\n')
        parts.append(joint_xml(f"{side}_hand_fixed", "fixed", ee, f"{side}_hand",
                               xyz=(0, 0, -0.05)))
    # legs (2 x 6)
    for side, sy in (("left", 1), ("right", -1)):
        foot = chain("pelvis", f"{side}_leg", [
            ("hip_yaw", (0, 0, 1), (0, sy * 0.1, -0.05), 1.5, 0.06, 0.08, (0, 0, 0)),
            ("hip_roll", (1, 0, 0), (0, 0, -0.05), 1.5, 0.06, 0.08, (0, 0, 0)),
            ("hip_pitch", (0, 1, 0), (0, 0, -0.04), 4.0, 0.07, 0.35, (0, 0, -0.17)),
            ("knee", (0, 1, 0), (0, 0, -0.35), 3.0, 0.05, 0.35, (0, 0, -0.17)),
            ("ankle_pitch", (0, 1, 0), (0, 0, -0.35), 0.8, 0.04, 0.06, (0, 0, 0)),
            ("ankle_roll", (1, 0, 0), (0, 0, -0.04), 0.8, 0.09, 0.04, (0.03, 0, -0.02)),
        ])
        parts.append(f'  <link name="{side}_sole"/>\n')
        parts.append(joint_xml(f"{side}_sole_fixed", "fixed", foot, f"{side}_sole",
                               xyz=(0.02, 0, -0.03)))
    parts.append("</robot>\n")
    with open(path, "w") as f:
        f.write("".join(parts))


def main():
    gen_arm7(os.path.join(HERE, "arm7.urdf"))
    gen_quadruped(os.path.join(HERE, "quadruped12.urdf"))
    gen_humanoid(os.path.join(HERE, "humanoid30.urdf"))
    print("wrote arm7.urdf quadruped12.urdf humanoid30.urdf")


if __name__ == "__main__":
    main()
