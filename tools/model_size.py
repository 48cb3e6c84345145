"""Model footprint + load-time report — the BenchmarkV3Size analogue.

The reference's `BenchmarkV3Size`
(`langid-java-experiments/.../BenchmarkV3Size.java:8-20`) prints the
LangIdV3 model's load time and per-array RAM (RamUsageEstimator).  Same
report here for BOTH engines' models: the bundled 53-profile sampling
DetectorModel and the real langid.py LangIdV3 model (npz), with numpy
`nbytes` as the exact array footprint (no estimator needed — the arrays
ARE the model) plus on-disk artifact sizes and broadcast-payload size
(what every executor actually receives).

    python tools/model_size.py      # writes BENCH/model_size.json
"""

from __future__ import annotations

import io
import json
import pickle
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def _arrays_report(obj_arrays: dict) -> dict:
    rep = {k: int(v.nbytes) for k, v in obj_arrays.items()}
    rep["total_bytes"] = sum(rep.values())
    return rep


def main() -> int:
    out: dict = {}

    t0 = time.time()
    from language_detection_spark.models.factory import load_default_model

    model = load_default_model()
    out["detector_model"] = {
        "load_time_sec": round(time.time() - t0, 3),
        "langs": len(model.langs),
        "arrays": _arrays_report(
            {"keys": model.keys, "probs": model.probs}
        ),
        # what a broadcast actually ships (pickle of __getstate__, which
        # drops reconstructible caches)
        "broadcast_pickle_bytes": len(pickle.dumps(model)),
    }

    t0 = time.time()
    from language_detection_spark.operators.langid_v3 import LangIdModel

    lm = LangIdModel.load_npz()
    arrays = {
        name: getattr(lm, name)
        for name in vars(lm)
        if hasattr(getattr(lm, name), "nbytes")
    }
    out["langid_v3_model"] = {
        "load_time_sec": round(time.time() - t0, 3),
        "arrays": _arrays_report(arrays),
        "broadcast_pickle_bytes": len(pickle.dumps(lm)),
    }

    data_dir = ROOT / "language_detection_spark" / "data"
    out["on_disk"] = {
        p.name: p.stat().st_size
        for p in sorted(data_dir.glob("*"))
        if p.is_file()
    }
    ref = {
        "reference_langid_lzma_bytes": None,
        "note": "reference BenchmarkV3Size prints RamUsageEstimator sizes of "
                "the same arrays; ours are exact numpy nbytes",
    }
    for cand in Path("/root/reference").rglob("langid.lzma"):
        ref["reference_langid_lzma_bytes"] = cand.stat().st_size
        break
    out["reference"] = ref

    (ROOT / "BENCH" / "model_size.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
