"""Track-data loader parity: the ACTUAL reference load_hurdat /
load_ibtracs (evaluate/track.py:84-148, pandas-based) vs the stdlib-csv
ports in ladcast_tpu.evaluate.tracker, on synthetic fixture files."""

from datetime import datetime

import numpy as np
import pytest

from ladcast_tpu.evaluate import tracker as mine
from tests.oracles.refload import load_reference

REF = load_reference("ladcast.evaluate.track")

HURDAT = """\
AL092018, FLORENCE, 4,
20180901, 0000,  , TS, 12.9N,  18.4W,  35, 1006,
20180901, 0600,  , TS, 13.2N,  19.9W,  40, 1003,
20180901, 1200,  , TS, 13.6N,  21.5W,  45, 1000,
20180901, 1800,  , TS, 13.9S,  23.0E,  50,  998,
AL102018, HELENE, 2,
20180907, 1200,  , TD, 12.0N,  21.0W,  30, 1007,
20180907, 1800,  , TD, 12.4N,  22.4W,  35, 1005,
"""

IBTRACS = """\
SID,SEASON,NUMBER,BASIN,NAME,ISO_TIME,LAT,LON
,Year,,,,,degrees_north,degrees_east
2018242N13343,2018,50,NA,FLORENCE,2018-09-01 00:00:00,12.9,-18.4
2018242N13343,2018,50,NA,FLORENCE,2018-09-01 06:00:00,13.2,-19.9
2018242N13343,2018,50,NA,FLORENCE,2018-09-01 12:00:00,13.6,-21.5
2018249N12341,2018,51,NA,HELENE,2018-09-07 12:00:00,12.0,-21.0
"""


@pytest.mark.parametrize("storm,n", [("AL092018", 4), ("AL102018", 2)])
def test_hurdat_loader_matches_reference(tmp_path, storm, n):
    p = tmp_path / "hurdat.txt"
    p.write_text(HURDAT)
    ref = REF.load_hurdat(str(p), storm)          # pandas DataFrame
    got = mine.load_hurdat(str(p), storm)         # [(dt, lat, lon)]
    assert len(got) == len(ref) == n
    for (t, la, lo), (_, row) in zip(got, ref.iterrows()):
        assert t == row["time"].to_pydatetime()
        np.testing.assert_allclose([la, lo], [row["lat"], row["lon"]])


def test_ibtracs_loader_matches_reference(tmp_path):
    p = tmp_path / "ibtracs.csv"
    p.write_text(IBTRACS)
    ref = REF.load_ibtracs("2018242N13343", str(p))
    got = mine.load_ibtracs_csv(str(p), "2018242N13343")
    assert len(got) == len(ref) == 3
    for (t, la, lo), (_, row) in zip(got, ref.iterrows()):
        assert t == row["time"].to_pydatetime()
        np.testing.assert_allclose([la, lo], [row["lat"], row["lon"]])
    assert all(0 <= lo < 360 for _, _, lo in got)


def test_loader_missing_storm_raises(tmp_path):
    p = tmp_path / "hurdat.txt"
    p.write_text(HURDAT)
    with pytest.raises(ValueError):
        mine.load_hurdat(str(p), "AL999999")
    with pytest.raises(ValueError):
        REF.load_hurdat(str(p), "AL999999")
