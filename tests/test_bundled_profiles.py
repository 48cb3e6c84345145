"""The shipped artifact must run with NO reference checkout mounted:
the 53 standard + 47 short-message shuyo-format profiles are bundled
under language_detection_spark/data/profiles[.sm]/ (Apache-2.0, same
license as the bundled langid model) and the default loader resolves
them — via filesystem path when the package is a directory, via
importlib.resources traversal when imported from pipeline.zip."""

import os

import numpy as np
import pytest


def test_bundled_profile_dir_is_inside_package():
    from language_detection_spark.config import bundled_profile_dir

    d = bundled_profile_dir()
    assert d is not None and os.path.isdir(d)
    assert "language_detection_spark" in d and "reference" not in d
    assert len([f for f in os.listdir(d) if not f.startswith(".")]) == 53
    sm = bundled_profile_dir(short_messages=True)
    assert sm is not None
    assert len([f for f in os.listdir(sm) if not f.startswith(".")]) == 47


def test_default_model_loads_without_reference_checkout(monkeypatch):
    """DEFAULT_PROFILE_DIR no longer points at /root/reference — the
    default model comes from the package itself."""
    from language_detection_spark.config import DEFAULT_PROFILE_DIR
    from language_detection_spark.models.factory import load_default_model

    if "LANGDETECT_PROFILE_DIR" not in os.environ:
        assert "reference" not in DEFAULT_PROFILE_DIR
    m = load_default_model()
    assert len(m.langs) == 53


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/profiles"),
    reason="reference checkout not mounted",
)
def test_bundled_profiles_match_reference_bytes():
    """Bundled profile files are byte-identical to the reference's —
    the detector model built from them is therefore identical too."""
    from language_detection_spark.config import bundled_profile_dir

    for bundle, ref in [
        (bundled_profile_dir(), "/root/reference/profiles"),
        (bundled_profile_dir(True), "/root/reference/profiles.sm"),
    ]:
        names = sorted(os.listdir(ref))
        assert sorted(os.listdir(bundle)) == names
        for n in names:
            with open(os.path.join(bundle, n), "rb") as a, open(
                os.path.join(ref, n), "rb"
            ) as b:
                assert a.read() == b.read(), n


def test_zip_style_bundled_loader_matches_directory_loader():
    """_load_bundled (the importlib.resources traversal used when the
    package rides in pipeline.zip) builds the same model as the
    filesystem directory loader."""
    from language_detection_spark.config import bundled_profile_dir
    from language_detection_spark.models.factory import (
        DetectorModel,
        _load_bundled,
    )

    via_zip_path = _load_bundled("profiles")
    via_dir = DetectorModel.load_directory(bundled_profile_dir())
    assert via_zip_path.langs == via_dir.langs
    assert np.array_equal(via_zip_path.keys, via_dir.keys)
    assert np.array_equal(via_zip_path.probs, via_dir.probs)
