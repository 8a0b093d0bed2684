#!/usr/bin/env python
"""Import the warehouse map/graph data assets from a reference checkout.

The upstream repo (Woodenonez/DyObAv-MPCnWTA-Warehouse) ships the warehouse
scene as data files: an occupancy PGM, a navigation-graph JSON, and the
grayscale `label.png` used as the predictor's map channel.  These are data,
not code; this script copies them (with provenance recorded) into `data/`
so the framework is runnable standalone.

Usage: python scripts/import_reference_data.py [REFERENCE_ROOT]
"""
import json
import os
import shutil
import sys

DEFAULT_REF = "/root/reference"


def main() -> None:
    ref_root = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_REF
    src = os.path.join(ref_root, "data", "warehouse_sim_original")
    dst = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "data", "warehouse_sim_original")
    os.makedirs(dst, exist_ok=True)
    for fname in ["mymap.pgm", "mygraph.json", "label.png", "mymap.yaml"]:
        src_f = os.path.join(src, fname)
        if os.path.exists(src_f):
            shutil.copy(src_f, os.path.join(dst, fname))
            print(f"imported {fname}")
    with open(os.path.join(dst, "PROVENANCE.json"), "w") as f:
        json.dump({
            "source": "Woodenonez/DyObAv-MPCnWTA-Warehouse",
            "path": "data/warehouse_sim_original",
            "kind": "map/scene data assets (not code)",
        }, f, indent=2)
    print("done:", dst)


if __name__ == "__main__":
    main()
