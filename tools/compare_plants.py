#!/usr/bin/env python
"""Cross-engine plant divergence: JAX plant vs host MuJoCo, same controller.

Usage: python tools/compare_plants.py [n_ticks=400] [--direct-thrust]
           [--no-ramp] [--out PLANTDIV.json]

Prints (and optionally writes) the divergence report from
ironcub_mpc_tpu.sim.validate.compare_plants — the evidence that the
production JAX plant's physics tracks MuJoCo's under closed-loop control.
"""

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_ticks = int(args[0]) if args else 400
    use_nn = "--direct-thrust" not in sys.argv
    ramp = "--no-ramp" not in sys.argv

    from ironcub_mpc_tpu.sim.validate import compare_plants

    report = compare_plants(n_ticks=n_ticks, use_nn=use_nn, alpha_ramp=ramp)
    print(json.dumps(report))
    for i, a in enumerate(sys.argv):
        if a == "--out" and i + 1 < len(sys.argv):
            Path(sys.argv[i + 1]).write_text(
                json.dumps(report, indent=1) + "\n")
            print(f"-> {sys.argv[i + 1]}")


if __name__ == "__main__":
    main()
