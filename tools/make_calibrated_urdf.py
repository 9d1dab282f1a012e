#!/usr/bin/env python
"""Regenerate the committed calibrated iRonCub-Mk3 URDF.

Emits ``data/ironcub_mk3_calibrated.urdf`` from the calibrated procedural
model (dynamics/ironcub_model.py), authored rooted at ``root_link`` — the
same convention as the real non-redistributable asset
(configMujoco.toml:2) — so that loading it exercises the full reduction +
re-rooting path (Robot.cpp:82-103 contract): the flagship loads it with
``load_urdf(path, axesList, "chest")``, traversing the torso revolute
joints against their authored direction.

Run after intentional calibration changes:
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/make_calibrated_urdf.py
"""

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from ironcub_mpc_tpu.dynamics.ironcub_model import (  # noqa: E402
    CALIBRATED_URDF, TOTAL_MASS_KG, build_ironcub_model)
from ironcub_mpc_tpu.dynamics.urdf_export import model_to_urdf  # noqa: E402


def main():
    model = build_ironcub_model()
    assert abs(model.total_mass - TOTAL_MASS_KG) < 1e-9, model.total_mass
    xml = model_to_urdf(model, "root_link", robot_name="iRonCub-Mk3-calibrated")
    Path(CALIBRATED_URDF).write_text(xml)
    print(f"wrote {CALIBRATED_URDF}: {model.n_links} links, "
          f"{model.n_joints} joints, {model.total_mass:.1f} kg")


if __name__ == "__main__":
    main()
