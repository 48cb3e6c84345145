"""Bitwise parity of the java.util.Random replica against values produced
by an actual JDK 17 `java.util.Random` (seeds 0, 1, 42, -7, 123456789;
sequence: 6× nextInt(97), 4× nextGaussian, 3× nextDouble — dumped once
with javac/java in the build sandbox, frozen here as goldens)."""

import math

import pytest

from language_detection_spark.functions.javarandom import JavaRandom

# seed: ([ints], [gaussians], [doubles])
_GOLDENS = {
    0: (
        [60, 79, 40, 87, 79, 69],
        [1.1309640497243958, 2.1872869364807714, -1.5663059655859255, -1.0782296385818608],
        [0.984841540199809, 0.8791825178724801, 0.9412491794821144],
    ),
    1: (
        [36, 19, 90, 49, 54, 49],
        [-0.0542290976338066, 0.1516351892683758, 0.63847575097573, -0.15020446215665365],
        [0.34751802920311026, 0.29405703200403677, 0.5064836273262351],
    ),
    42: (
        [41, 65, 15, 68, 93, 41],
        [-1.2314225495957323, 0.9144954758720792, 0.7712775326519722, -0.25089675133752143],
        [0.2757480694417024, 0.46365357580915334, 0.7829017787900358],
    ),
    -7: (
        [29, 77, 76, 44, 64, 53],
        [-0.0925965725541754, 0.9309841410094435, -1.2050769225343736, 0.31961411959632047],
        [0.5676373706654751, 0.35478739662693215, 0.4930038433003834],
    ),
    123456789: (
        [94, 4, 57, 24, 65, 50],
        [0.4489742845945291, 0.28495036521947015, -2.206150336355039, -0.3866571681532721],
        [0.4871982258300084, 0.11470139202140195, 0.24882961263219205],
    ),
}


@pytest.mark.parametrize("seed", sorted(_GOLDENS))
def test_java_random_parity(seed):
    ints, gaussians, doubles = _GOLDENS[seed]
    r = JavaRandom(seed)
    assert [r.next_int(97) for _ in range(6)] == ints
    for want in gaussians:
        got = r.next_gaussian()
        # gaussian uses log/sqrt — allow 1-ulp-scale drift vs StrictMath
        assert got == pytest.approx(want, rel=0, abs=5e-16), (got, want)
    for want in doubles:
        assert r.next_double() == want  # pure bit arithmetic: exact
    assert not math.isnan(r.next_gaussian())
