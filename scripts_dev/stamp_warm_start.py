"""Add warm-start provenance to an already-exported deploy artifact.

The round-5 trainer records ``header['warm_start']`` itself (train_cmd
--init_npz -> export_deploy warm_start=...), but a run that was already in
flight when that code landed exports under the old code path. This stamps the
same provenance post-hoc — params untouched, only the JSON header grows a
``warm_start`` entry with ``total_steps = global_step + prior_steps`` and a
note that the stamp was post-hoc.

Usage: stamp_warm_start.py <artifact.npz> <from_name> <prior_steps>
"""
from __future__ import annotations

import json
import sys

import numpy as np


def main() -> int:
    path, from_name, prior = sys.argv[1], sys.argv[2], int(sys.argv[3])
    z = np.load(path)
    header = json.loads(bytes(z["__header__"]).decode())
    if "warm_start" in header:
        print(f"{path}: warm_start already present ({header['warm_start']}); not touching")
        return 0
    gs = int(header.get("global_step") or 0)
    header["warm_start"] = {
        "from": from_name,
        "prior_steps": prior,
        "total_steps": gs + prior,
        "stamp": "post-hoc (scripts_dev/stamp_warm_start.py)",
    }
    flat = {k: z[k] for k in z.files if k != "__header__"}
    np.savez_compressed(
        path, __header__=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8), **flat
    )
    print(f"{path}: stamped warm_start {header['warm_start']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
