"""Regenerate data/langid_model.npz from the reference's langid.lzma using
the pure-Python reader (no JDK needed; see models/langid_lzma.py).

    python tools/gen_langid_npz.py [path-to-langid.lzma] [out.npz]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DEFAULT_LZMA = (
    "/root/reference/src/main/resources/com/carrotsearch/labs/langid/langid.lzma"
)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_LZMA
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else str(
            Path(__file__).resolve().parents[1]
            / "language_detection_spark"
            / "data"
            / "langid_model.npz"
        )
    )
    from language_detection_spark.models.langid_lzma import load_model

    model = load_model(src)
    model.save_npz(out)
    print(f"wrote {out}: {len(model.langs)} langs, {model.n_features} features")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
