"""Golden ports of TagExtractorTest
(/root/reference/src/test/java/com/cybozu/labs/langdetect/util/TagExtractorTest.java)
plus the Spark abstract-scan."""

from language_detection_spark.models.profile import LangProfile
from language_detection_spark.sources.wiki_abstracts import (
    TagExtractor,
    extract_abstracts,
    read_abstracts,
)


def test_tag_extractor_ctor():  # TagExtractorTest.java:20-29
    e = TagExtractor(None, 0)
    assert e.target is None and e.threshold == 0
    e2 = TagExtractor("abstract", 10)
    assert e2.target == "abstract" and e2.threshold == 10


def test_set_tag_and_add():  # TagExtractorTest.java:36-55
    e = TagExtractor(None, 0)
    e.set_tag("")
    assert e.tag == ""
    e.set_tag(None)
    assert e.tag is None
    e.add("")
    e.add(None)  # ignored
    e.close_tag()  # ignored


def test_normal_scenario():  # TagExtractorTest.java:71-98
    e = TagExtractor("abstract", 10)
    assert e.count == 0
    profile = LangProfile("en")

    e.set_tag("abstract")
    e.add("This is a sample text.")
    profile.update(e.close_tag())
    assert e.count == 1
    assert profile.n_words[0] == 17  # Thisisasampletext
    assert profile.n_words[1] == 22
    assert profile.n_words[2] == 17

    e.set_tag("abstract")
    e.add("sample")  # too short
    profile.update(e.close_tag())
    assert e.count == 1

    e.set_tag("div")  # other tag
    e.add("This is a sample text which is enough long.")
    profile.update(e.close_tag())
    assert e.count == 1


def test_clear():  # TagExtractorTest.java:104-116
    e = TagExtractor("abstract", 10)
    e.set_tag("abstract")
    e.add("This is a sample text.")
    assert e.buf == "This is a sample text."
    assert e.tag == "abstract"
    e.clear()
    assert e.buf == "" and e.tag is None


def test_extract_abstracts_threshold():
    xml = (
        "<feed><doc><title>T</title><abstract>short</abstract></doc>"
        "<doc><abstract>" + "long enough text " * 8 + "</abstract></doc>"
        "<doc><abstract>" + "x &amp; y " * 20 + "</abstract></doc></feed>"
    )
    got = extract_abstracts(xml, threshold=100)
    assert len(got) == 2
    assert "x & y" in got[1]


def test_read_abstracts_spark(spark, tmp_path):
    lines = []
    for i in range(30):
        body = ("the quick brown fox jumps over the lazy dog " * 4).strip()
        if i % 3 == 0:
            body = "tiny"
        lines.append(f"<doc><title>t{i}</title><abstract>{body}</abstract></doc>")
    p = tmp_path / "abstracts.xml"
    p.write_text("\n".join(lines), encoding="utf-8")
    df = read_abstracts(spark, str(p), threshold=100)
    rows = df.collect()
    assert len(rows) == 20  # the 10 "tiny" ones filtered out
    assert all(len(r.text) > 100 for r in rows)
