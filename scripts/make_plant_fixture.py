"""Generate tests/fixtures/plant_traits_like.csv — a deterministic
136x31 frame with the same structural contract as R's
``cluster::plantTraits`` (the dataset the reference's modify tests fetch
over the network via statsmodels, reference tests/modify/conftest.py:6-10,
unavailable offline here).

Engineered properties, mirroring the counts the reference's golden logs
assert (reference tests/modify/test_modify.py):

- 136 rows, ID index, 31 variables with plantTraits' column names;
- exactly 11 columns with !=2 distinct non-NA values (the ones the
  reference's make_binary error names: pdias longindex durflow height
  begflow mycor vegaer vegsout autopoll insects wind); the other 20 are
  strictly 0/1;
- exactly 19 columns contain >=1 NA (colfilter_min_n(n=136) removes 19
  of 31 continuous -> "Removed 19 (61.29%)", shape (136, 12));
- exactly 7 columns are >=90% zero among non-NA values
  (colfilter_percent_zero -> "Removed 7 (22.58%)", shape (136, 24)).

Run: python scripts/make_plant_fixture.py  (idempotent, seeded)
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

COLS = [
    "pdias", "longindex", "durflow", "height", "begflow", "mycor",
    "vegaer", "vegsout", "autopoll", "insects", "wind",
    "lign", "piq", "ros", "semiros", "leafy", "suman", "winan",
    "monocarp", "polycarp", "seasaes", "seasver", "seashiv",
    "everalw", "everparti", "elaio", "endozoo", "epizoo", "aquat",
    "windgl", "unsp",
]
MULTI = COLS[:11]  # != 2 distinct values -> make_binary rejects these
NA_COLS = MULTI + [
    "lign", "monocarp", "polycarp", "seasaes", "seasver", "seashiv",
    "elaio", "endozoo",
]  # 19 columns with missing values
ZERO90 = ["everalw", "everparti", "elaio", "epizoo", "aquat", "windgl", "unsp"]
N = 136


def main() -> None:
    rng = np.random.RandomState(20260814)
    data: dict[str, np.ndarray] = {}
    # 11 multi-valued (ordinal/continuous) trait columns
    data["pdias"] = np.round(rng.lognormal(0.0, 1.2, N), 2)
    data["longindex"] = np.round(rng.uniform(0, 1, N), 3)
    data["durflow"] = rng.randint(1, 10, N).astype(float)
    data["height"] = rng.randint(1, 9, N).astype(float)
    data["begflow"] = rng.randint(1, 10, N).astype(float)
    data["mycor"] = rng.randint(0, 3, N).astype(float)
    data["vegaer"] = rng.randint(0, 3, N).astype(float)
    data["vegsout"] = rng.randint(0, 3, N).astype(float)
    data["autopoll"] = rng.randint(0, 4, N).astype(float)
    data["insects"] = rng.randint(0, 6, N).astype(float)
    data["wind"] = rng.randint(0, 6, N).astype(float)
    # 20 strictly-binary columns (0/1 with both levels present)
    for c in COLS[11:]:
        if c in ZERO90:
            ones = rng.choice(N, size=rng.randint(2, 9), replace=False)
        else:
            ones = rng.choice(N, size=rng.randint(30, 100), replace=False)
        v = np.zeros(N)
        v[ones] = 1.0
        data[c] = v
    df = pd.DataFrame(data, columns=COLS)
    # plant NAs: every NA_COLS column gets 1..20 missing entries; for
    # ZERO90 overlap keep enough non-NA zeros that the >=90% ratio holds
    for c in NA_COLS:
        k = rng.randint(1, 21) if c not in ZERO90 else rng.randint(1, 6)
        idx = rng.choice(N, size=k, replace=False)
        df.loc[idx, c] = np.nan
    # invariant checks (the test re-asserts these through the operators)
    nuniq = df.nunique(dropna=True)
    assert sorted(nuniq[nuniq != 2].index) == sorted(MULTI), nuniq[nuniq != 2]
    assert int(df.isna().any().sum()) == 19
    pz = (df == 0).sum() / df.notna().sum() * 100.0
    assert sorted(pz[pz >= 90.0].index) == sorted(ZERO90), pz[pz >= 90.0]
    df.index = pd.RangeIndex(1, N + 1, name="ID")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "plant_traits_like.csv",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    df.to_csv(out, na_rep="NA")
    print(f"wrote {out}: {df.shape}")


if __name__ == "__main__":
    main()
