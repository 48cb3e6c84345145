"""One-time extraction of character-normalization data tables.

The reference engine (phax/language-detection) ships its normalization
constants as a Java properties resource
(``src/main/resources/com/cybozu/labs/langdetect/util/messages.properties``,
consumed by ``util/NGram.java:17,199-340``).  Behavioral parity requires the
same *data*; this script re-encodes it as JSON under
``language_detection_spark/data/normalization.json`` so the engine is
standalone.  Run once in the build sandbox; the JSON output is committed.

Usage:  python tools/extract_tables.py [path-to-messages.properties]
"""

from __future__ import annotations

import json
import pathlib
import sys

DEFAULT_SRC = (
    "/root/reference/src/main/resources/com/cybozu/labs/langdetect/util/"
    "messages.properties"
)
OUT = (
    pathlib.Path(__file__).resolve().parents[1]
    / "language_detection_spark"
    / "data"
    / "normalization.json"
)

# Keys consumed by NGram.java (see NGram.java:215-340 for the KANJI list,
# :17 for LATIN1_EXCLUDE, :199-205 for the Vietnamese tables).
KANJI_KEYS_ORDER_SOURCE = "NGram.KANJI_"
VI_KEYS = [
    "NORMALIZED_VI_CHARS_0300",
    "NORMALIZED_VI_CHARS_0301",
    "NORMALIZED_VI_CHARS_0303",
    "NORMALIZED_VI_CHARS_0309",
    "NORMALIZED_VI_CHARS_0323",
]


def parse_properties(path: str) -> dict[str, str]:
    """Minimal Java-properties parser: `key=value` lines with \\uXXXX escapes."""
    props: dict[str, str] = {}
    for raw in pathlib.Path(path).read_text(encoding="utf-8").splitlines():
        line = raw.strip()
        if not line or line.startswith(("#", "!")) or "=" not in line:
            continue
        key, _, value = line.partition("=")
        props[key.strip()] = value.encode("ascii").decode("unicode_escape")
    return props


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    props = parse_properties(src)
    # Keep the KANJI class strings in file order — the representative char of
    # each class is its first char (NGram.java:341-352), order is otherwise
    # irrelevant, but keep it stable for reproducibility.
    kanji = [
        props[k]
        for k in props
        if k.startswith(KANJI_KEYS_ORDER_SOURCE) and "EXCLUDE" not in k
    ]
    out = {
        "latin1_exclude": props["NGram.LATIN1_EXCLUDE"],
        "cjk_kanji_classes": kanji,
        "vi_to_normalize_chars": props["TO_NORMALIZE_VI_CHARS"],
        "vi_dmark_class": props["DMARK_CLASS"],
        "vi_normalized_chars": [props[k] for k in VI_KEYS],
    }
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(
        json.dumps(out, ensure_ascii=True, indent=1), encoding="utf-8"
    )
    n_cjk = sum(len(s) for s in kanji)
    print(f"wrote {OUT} ({len(kanji)} CJK classes, {n_cjk} mapped chars)")


if __name__ == "__main__":
    main()
