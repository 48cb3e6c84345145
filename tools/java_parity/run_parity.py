"""Compile the reference's Java detector (read-only sources + dependency
stubs) and compare its seeded output against our faithful Detector on the
same profiles and texts.  Usage: python tools/java_parity/run_parity.py
[n_texts].  Exit 0 iff every (label, probability) agrees within 1e-9.
"""

from __future__ import annotations

import base64
import pathlib
import random
import shutil
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent
ROOT = HERE.parents[1]
REF = pathlib.Path("/root/reference/src/main/java")
REF_RES = pathlib.Path(
    "/root/reference/src/main/resources/com/cybozu/labs/langdetect/util/messages.properties"
)
PROFILES = pathlib.Path("/root/reference/profiles")
EUROPARL = pathlib.Path("/root/reference/src/test/resources/europarl.18.test")

REF_SOURCES = [
    "com/cybozu/labs/langdetect/Detector.java",
    "com/cybozu/labs/langdetect/DetectorFactory.java",
    "com/cybozu/labs/langdetect/Language.java",
    "com/cybozu/labs/langdetect/LangDetectException.java",
    "com/cybozu/labs/langdetect/ELangDetectErrorCode.java",
    "com/cybozu/labs/langdetect/util/NGram.java",
    "com/cybozu/labs/langdetect/util/LangProfile.java",
    "com/cybozu/labs/langdetect/util/Messages.java",
]


def build(work: pathlib.Path) -> pathlib.Path:
    classes = work / "classes"
    classes.mkdir(parents=True, exist_ok=True)
    stub_files = [str(p) for p in (HERE / "stubs").rglob("*.java")]
    srcs = [str(REF / s) for s in REF_SOURCES] + stub_files + [
        str(HERE / "ParityHarness.java")
    ]
    subprocess.run(
        ["javac", "-encoding", "utf-8", "-d", str(classes)] + srcs,
        check=True,
    )
    res = classes / "com/cybozu/labs/langdetect/util/messages.properties"
    shutil.copy(REF_RES, res)
    return classes


def export_profiles(work: pathlib.Path, langs: list[str]) -> pathlib.Path:
    sys.path.insert(0, str(ROOT))
    from language_detection_spark.models.profile import LangProfile

    out = work / "profiles_tsv"
    out.mkdir(exist_ok=True)
    for lang in langs:
        p = LangProfile.load(PROFILES / lang)
        lines = [f"{p.name}\t{p.n_words[0]}\t{p.n_words[1]}\t{p.n_words[2]}"]
        for gram, count in p.freq.items():
            g64 = base64.b64encode(gram.encode("utf-8")).decode("ascii")
            lines.append(f"{g64}\t{count}")
        (out / lang).write_text("\n".join(lines), encoding="utf-8")
    return out


def main() -> int:
    n_texts = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    work = pathlib.Path("/tmp/java_parity")
    work.mkdir(exist_ok=True)
    langs = sorted(
        f.name for f in PROFILES.iterdir() if f.is_file() and not f.name.startswith(".")
    )
    classes = build(work)
    prof_dir = export_profiles(work, langs)

    rows = [line.split("\t", 1) for line in EUROPARL.read_text(encoding="utf-8").splitlines()]
    rnd = random.Random(0xDEADBEEF)
    rnd.shuffle(rows)
    texts = [t for _, t in rows[:n_texts]]
    texts += ["a", "b d", "ああああa", "12345 67890"]
    seeds = [1000 + 7 * i for i in range(len(texts))]

    tf = work / "texts.b64"
    tf.write_text(
        "\n".join(base64.b64encode(t.encode("utf-8")).decode("ascii") for t in texts),
        encoding="ascii",
    )
    proc = subprocess.run(
        ["java", "-cp", str(classes), "ParityHarness", str(prof_dir), str(tf),
         ",".join(map(str, seeds))],
        capture_output=True, text=True, check=True,
    )

    from language_detection_spark.models.factory import DetectorModel
    from language_detection_spark.operators.detector import CantDetectError, Detector

    model = DetectorModel.load_directory(PROFILES)
    assert model.langs == langs
    mismatches = 0
    total = 0
    max_dp = 0.0
    for line in proc.stdout.splitlines():
        i_s, _, payload = line.partition("\t")
        i = int(i_s)
        d = Detector(model, seed=seeds[i])
        d.append(texts[i])
        try:
            ours = d.get_probabilities()
        except CantDetectError:
            ours = None
        if payload.startswith("ERROR:"):
            ok = ours is None
            java = []
        else:
            java = [
                (kv.rsplit(":", 1)[0], float(kv.rsplit(":", 1)[1]))
                for kv in payload.split(",") if kv
            ]
            ok = ours is not None and len(java) == len(ours) and all(
                jl == ol and abs(jp - op) < 1e-9
                for (jl, jp), (ol, op) in zip(java, ours)
            )
            if ok and ours:
                max_dp = max(
                    max_dp,
                    max(abs(jp - op) for (_, jp), (_, op) in zip(java, ours)),
                )
        total += 1
        if not ok:
            mismatches += 1
            if mismatches <= 3:
                print(f"MISMATCH i={i} text={texts[i][:60]!r}")
                print(f"  java: {java}")
                print(f"  ours: {ours}")
    print(
        f"parity: {total - mismatches}/{total} identical "
        f"(max |dp| on matches: {max_dp:.2e})"
    )
    return 1 if mismatches else 0


if __name__ == "__main__":
    raise SystemExit(main())
