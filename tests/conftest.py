import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from language_detection_spark.config import get_spark

    s = get_spark("ldspark-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def tiny_model():
    from language_detection_spark.models.factory import DetectorModel
    from language_detection_spark.models.profile import LangProfile

    corpus = {
        "en": [
            "the quick brown fox jumps over the lazy dog and the cat",
            "language detection is fun and this library detects the language of text",
            "spark is a distributed engine for large scale data processing",
        ],
        "fr": [
            "le renard brun saute par dessus le chien paresseux et le chat",
            "la détection de la langue est amusante et cette bibliothèque détecte la langue",
            "spark est un moteur distribué pour le traitement de données à grande échelle",
        ],
        "de": [
            "der schnelle braune fuchs springt über den faulen hund und die katze",
            "die spracherkennung macht spaß und diese bibliothek erkennt die sprache",
            "spark ist eine verteilte engine für die verarbeitung großer datenmengen",
        ],
    }
    profiles = []
    for lang, texts in corpus.items():
        p = LangProfile(lang)
        for t in texts:
            p.update(t)
        profiles.append(p)
    return DetectorModel.from_profiles(profiles)
