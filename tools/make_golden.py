"""Generate golden kinematics traces from real MuJoCo for test validation.

Reads the reference MJCF trees (read-only, /root/reference/gym_kmanip/assets),
strips mesh assets/geoms (the STLs are .gitignored upstream so the raw XMLs
cannot compile), injects placeholder inertials, compiles with the installed
`mujoco` wheel, and records site poses + Jacobians at random configurations.

Output: tests/golden/<robot>.npz, committed to the repo so the test suite
never depends on /root/reference or on MuJoCo being installed.

Run:  python tools/make_golden.py
"""

import io
import os
import sys
import xml.etree.ElementTree as ET

import numpy as np

REF_ASSETS = "/root/reference/gym_kmanip/assets"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

ENVS = {
    "solo_arm": ("_env_solo_arm.xml", ["eer_site_pos"], 10),
    "dual_arm": ("_env_dual_arm.xml", ["eer_site_pos", "eel_site_pos"], 20),
    "torso": ("_env_torso.xml", ["eer_site_pos", "eel_site_pos"], 20),
}


def resolve_includes(path: str) -> ET.Element:
    """Flatten <include> elements (MuJoCo-style merge)."""
    tree = ET.parse(path)
    root = tree.getroot()

    def expand(elem: ET.Element):
        children = list(elem)
        for i, ch in enumerate(children):
            if ch.tag == "include":
                sub = resolve_includes(os.path.join(REF_ASSETS, ch.attrib["file"]))
                # splice the *children* of mujocoinclude in place
                idx = list(elem).index(ch)
                elem.remove(ch)
                for j, sub_ch in enumerate(list(sub)):
                    elem.insert(idx + j, sub_ch)
            else:
                expand(ch)

    expand(root)
    return root


def merge_worldbodies(root: ET.Element) -> None:
    """MuJoCo merges repeated top-level sections; ElementTree does not."""
    for tag in ("worldbody", "asset", "actuator", "visual"):
        sections = root.findall(tag)
        if len(sections) > 1:
            first = sections[0]
            for extra in sections[1:]:
                for ch in list(extra):
                    first.append(ch)
                root.remove(extra)


def strip_meshes(root: ET.Element) -> None:
    for asset in root.findall(".//asset"):
        for mesh in list(asset.findall("mesh")):
            asset.remove(mesh)
    # remove all mesh geoms
    def scrub(elem):
        for geom in list(elem.findall("geom")):
            if geom.attrib.get("type") == "mesh" or "mesh" in geom.attrib:
                elem.remove(geom)
        for ch in elem:
            scrub(ch)

    scrub(root)


def add_inertials(root: ET.Element) -> None:
    def visit(body):
        has_joint = body.find("joint") is not None
        has_inertial = body.find("inertial") is not None
        if has_joint and not has_inertial and not body.findall("geom"):
            ine = ET.SubElement(body, "inertial")
            ine.set("pos", "0 0 0")
            ine.set("mass", "0.1")
            ine.set("diaginertia", "0.001 0.001 0.001")
        for ch in body.findall("body"):
            visit(ch)

    for wb in root.findall("worldbody"):
        for b in wb.findall("body"):
            visit(b)


def build_xml(env_file: str) -> str:
    root = resolve_includes(os.path.join(REF_ASSETS, env_file))
    merge_worldbodies(root)
    strip_meshes(root)
    add_inertials(root)
    return ET.tostring(root, encoding="unicode")


def main():
    import mujoco

    os.makedirs(OUT_DIR, exist_ok=True)
    rng = np.random.RandomState(0)
    for name, (env_file, site_names, nq_robot) in ENVS.items():
        xml = build_xml(env_file)
        model = mujoco.MjModel.from_xml_string(xml)
        data = mujoco.MjData(model)
        print(f"{name}: nq={model.nq} nv={model.nv} nu={model.nu}")
        lo = model.jnt_range[:nq_robot, 0]
        hi = model.jnt_range[:nq_robot, 1]
        N = 32
        qs = rng.uniform(lo, hi, size=(N, nq_robot))
        out = {"qpos": qs, "jnt_range": model.jnt_range[:nq_robot].copy()}
        for s in site_names:
            sid = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_SITE, s)
            pos = np.zeros((N, 3))
            mat = np.zeros((N, 9))
            jacp = np.zeros((N, 3, nq_robot))
            jacr = np.zeros((N, 3, nq_robot))
            for i in range(N):
                data.qpos[:nq_robot] = qs[i]
                mujoco.mj_kinematics(model, data)
                mujoco.mj_comPos(model, data)
                pos[i] = data.site(s).xpos
                mat[i] = data.site(s).xmat
                jp = np.zeros((3, model.nv))
                jr = np.zeros((3, model.nv))
                mujoco.mj_jacSite(model, data, jp, jr, sid)
                jacp[i] = jp[:, :nq_robot]
                jacr[i] = jr[:, :nq_robot]
            out[f"{s}_pos"] = pos
            out[f"{s}_mat"] = mat
            out[f"{s}_jacp"] = jacp
            out[f"{s}_jacr"] = jacr
        # joint frame world poses at home for extra coverage
        np.savez(os.path.join(OUT_DIR, f"{name}.npz"), **out)
        print(f"  wrote {name}.npz")


if __name__ == "__main__":
    main()
