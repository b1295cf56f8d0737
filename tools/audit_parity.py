"""Audit PARITY.md claims: every `module::Symbol` / `path.py` mentioned in the
petr_tpu column must exist. Run on CPU:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/audit_parity.py
"""
import importlib
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
text = (ROOT / "PARITY.md").read_text()

# `petr_tpu/...` or `models/...py::Symbol` style mentions inside backticks
mentions = re.findall(r"`([A-Za-z0-9_./]+\.py)(?:::([A-Za-z_][A-Za-z0-9_.]*))?`", text)

missing = []
checked = 0
for path, symbol in mentions:
    # resolve relative mentions against our trees first
    candidates = [
        ROOT / "petr_tpu" / path,
        ROOT / path,
        ROOT / "tests" / path,
        ROOT / "petr_tpu" / "train" / path,
    ]
    f = next((c for c in candidates if c.exists()), None)
    if f is None:
        # reference-repo citations are not ours to satisfy
        refroots = [
            "/root/reference/projects/mmdet3d_plugin",
            "/root/reference",
            "/root/reference/tools",
            "/root/reference/tools/data_converter",
            "/root/reference/projects/configs/petr",
            "/root/reference/projects/configs/petrv2",
        ]
        if any((pathlib.Path(r) / path).exists() for r in refroots):
            continue
        missing.append(f"FILE {path}")
        continue
    checked += 1
    if symbol:
        base = symbol.split(".")[0]
        if not re.search(rf"\b(def|class)\s+{re.escape(base)}\b|^{re.escape(base)}\s*=", f.read_text(), re.M):
            missing.append(f"SYMBOL {path}::{symbol}")

# also import every petr_tpu module mentioned as dotted path (cli entries etc.)
for mod in sorted(set(re.findall(r"`(petr_tpu(?:\.[a-z_0-9]+)+)`", text))):
    try:
        importlib.import_module(mod)
        checked += 1
    except Exception as e:  # noqa: BLE001
        missing.append(f"IMPORT {mod}: {e}")

print(f"checked {checked} mentions")
if missing:
    print("MISSING:")
    for m in missing:
        print(" ", m)
    sys.exit(1)
print("PARITY_AUDIT_OK")
