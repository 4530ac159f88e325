"""Round-8 additions: packaged real data files (crosswalk weights,
community-profiles mapping), the by-header-name ratio reader fix, and
the PIL-gated real-image-codec path."""

import csv
import json
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).parent.parent))

from db_factfinder_spark.sources.readers import (
    packaged_profile_mapping_path,
    packaged_ratio_path,
    read_ratio,
)

try:
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


# ---------------------------------------------------------------------------
# packaged crosswalk weights (VERDICT r7 ask #2)
# ---------------------------------------------------------------------------

def test_packaged_ratio_row_count_and_shape():
    with open(packaged_ratio_path()) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2416
    assert set(rows[0]) == {"boroct2010", "boroct2020", "ratio"}
    assert len({r["boroct2010"] for r in rows}) == 2167
    assert len({r["boroct2020"] for r in rows}) == 2327
    # every code is an 8-char boro+tract string (leading zeros intact)
    assert all(len(r["boroct2010"]) == 8 for r in rows)
    ratios = [float(r["ratio"]) for r in rows]
    assert sum(1 for x in ratios if x == 1.0) == 2051
    assert min(ratios) >= 0.0 and max(ratios) <= 1.0


def test_read_ratio_matches_by_header_name(spark, tmp_path):
    """The real file orders columns (boroct2020, boroct2010, ratio); a
    positional schema would silently swap the crosswalk direction."""
    df = read_ratio(spark)  # packaged default
    first = df.orderBy("boroct2010", "boroct2020").first()
    # file row "05000100","05000100" is symmetric — use an asymmetric
    # split row to prove the direction: find one where 2010 != 2020
    asym = (
        df.filter(F.col("boroct2010") != F.col("boroct2020"))
        .orderBy("boroct2010", "boroct2020")
        .first()
    )
    with open(packaged_ratio_path()) as f:
        rows = [r for r in csv.DictReader(f)
                if r["boroct2010"] != r["boroct2020"]]
    expect = min((r["boroct2010"], r["boroct2020"]) for r in rows)
    assert (asym["boroct2010"], asym["boroct2020"]) == expect
    assert first["ratio"] == "1.000000000000000000"


def test_prepare_ratio_on_packaged_weights(spark):
    from db_factfinder_spark.operators.vertical import prepare_ratio

    r = prepare_ratio(read_ratio(spark))
    rows = r.collect()
    assert len(rows) == 2416
    assert all(x["geoid_ct2010"].startswith("360") for x in rows[:50])
    assert all(len(x["geoid_ct2010"]) == 11 for x in rows[:50])
    # apportionment shares for a split 2010 tract stay in [0, 1]
    assert all(0.0 <= x["ratio"] <= 1.0 for x in rows)


# ---------------------------------------------------------------------------
# packaged community-profiles mapping (VERDICT r7 ask #3)
# ---------------------------------------------------------------------------

def test_packaged_profile_mapping_shape():
    with open(packaged_profile_mapping_path()) as f:
        mappings = json.load(f)
    assert len(mappings) == 75
    geos = {m["geotype"] for m in mappings}
    assert geos == {"CDTA", "borough", "city", "cdta_fp_100",
                    "cdta_fp_500"}
    out_cols = [oc for m in mappings for oc in m["column_mapping"].values()]
    assert len(out_cols) == 105
    assert len(set(out_cols)) == 105  # duplicate-column guard holds
    letters = {lt for m in mappings for lt in m["column_mapping"]}
    assert letters <= {"c", "e", "m", "p", "z"}


def test_real_mapping_through_community_profiles(spark):
    """The real 75-mapping file drives the one-shuffle assembly: 105
    output columns, CDTA and flood-zone values landing on the same
    geoid rows (the reference's outer-merge shape)."""
    from db_factfinder_spark.pipelines import community_profiles

    with open(packaged_profile_mapping_path()) as f:
        mappings = json.load(f)
    vi = {v: i for i, v in enumerate(
        sorted({m["pff_variable"] for m in mappings})
    )}

    def calc(var, geo):
        keys = {"CDTA": range(15), "borough": range(5), "city": range(1),
                "cdta_fp_100": range(0, 15, 3),
                "cdta_fp_500": range(0, 15, 2)}[geo]
        pref = {"CDTA": "CD", "borough": "B", "city": "Z",
                "cdta_fp_100": "CD", "cdta_fp_500": "CD"}[geo]
        i = vi[var]
        rows = [
            (f"{pref}{k:02d}", *(float(k * (i + 1) + l) for l in range(5)))
            for k in keys
        ]
        return spark.createDataFrame(
            rows,
            "census_geoid string, c double, e double, m double,"
            " p double, z double",
        )

    out = community_profiles(calc, mappings)
    assert len(out.columns) == 106  # census_geoid + 105 mapped columns
    rows = {r["census_geoid"]: r for r in out.collect()}
    # CDTA geoids carry BOTH plain-CDTA and flood-zone columns
    assert "CD00" in rows and "B00" in rows and "Z00" in rows
    fp_cols = [
        oc
        for m in mappings
        if m["geotype"] == "cdta_fp_100"
        for oc in m["column_mapping"].values()
    ]
    assert any(rows["CD00"][c] is not None for c in fp_cols)
    assert all(rows["CD01"][c] is None for c in fp_cols)  # 1 % 3 != 0


# ---------------------------------------------------------------------------
# capped headliner twins (VERDICT r7 ask #4): the caps must BIND under
# a planted flood/hub, keeping candidate counts bounded
# ---------------------------------------------------------------------------

def test_winnow_max_df_bounds_planted_flood(spark):
    """20 documents sharing one long boilerplate passage: uncapped the
    postings join emits all C(20,2)=190 boilerplate pairs; with
    max_df=4 every flood fingerprint drops and ONLY the planted
    2-document unique overlap survives."""
    from db_factfinder_spark.llmdata.winnow import winnow_pairs

    boiler = "this license text is identical boilerplate " * 4
    uniq = "a genuinely shared unique passage of real content here"
    rows = [(i, boiler + f" tail{i}") for i in range(20)]
    rows += [(100, uniq + " alpha ending one"), (101, uniq + " beta end")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = winnow_pairs(docs, k=20, w=8, min_shared=2).count()
    capped = winnow_pairs(docs, k=20, w=8, min_shared=2, max_df=4)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert uncapped >= 190
    assert got == {(100, 101)}


def test_adamic_max_degree_bounds_planted_hub(spark):
    """A degree-50 hub middle: uncapped the wedge join emits
    C(50,2)=1225 hub pairs; max_degree=25 drops the hub, leaving only
    the planted degree-2 middle's single wedge (whose score is exact,
    not truncated — the cap is a subset contract on middles)."""
    from db_factfinder_spark.llmdata.components import adamic_adar

    hub = [(i, 9999) for i in range(1000, 1050)]  # hub node 9999
    small = [(2001, 8888), (2002, 8888)]          # degree-2 middle
    edges = spark.createDataFrame(hub + small, "src long, dst long")

    uncapped = adamic_adar(edges, "src", "dst").count()
    capped = adamic_adar(edges, "src", "dst", max_degree=25).collect()
    assert uncapped == 1225 + 1
    assert len(capped) == 1
    r = capped[0]
    assert (r["id_a"], r["id_b"], r["n_common"]) == (2001, 2002, 1)
    import math

    assert r["aa_units"] == math.floor(1e9 / math.log(2.0) + 0.5)


# ---------------------------------------------------------------------------
# real image codec gate (VERDICT r7 ask #7)
# ---------------------------------------------------------------------------

@pytest.mark.skipif(HAS_PIL, reason="PIL present: gate does not raise")
def test_png_codec_without_pil_raises_documented_gate(spark):
    from db_factfinder_spark.llmdata.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, bytes(8), 4, 2)],
        "media_id long, payload binary, width int, height int",
    )
    out = resize_images(df, 2, 2, codec="png")
    with pytest.raises(Exception, match="NotImplementedError|needs PIL"):
        out.collect()


@pytest.mark.skipif(not HAS_PIL, reason="PIL not installed here")
def test_png_codec_with_pil_pins_resized_pixels(spark):
    """When a decoder exists, the png codec rides the SAME mapInPandas
    plan and the output pixels are pinned (nearest-neighbor grayscale,
    same _resize_nn as the raw codec) — re-encoded bytes would couple
    the test to an encoder build, pixels don't."""
    import io

    import numpy as np
    from PIL import Image

    from db_factfinder_spark.llmdata.multimodal import (
        _resize_nn,
        resize_images,
    )

    arr = np.arange(8, dtype=np.uint8).reshape(2, 4) * 30
    buf = io.BytesIO()
    Image.fromarray(arr, mode="L").save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, buf.getvalue(), 4, 2), (2, None, 4, 2)],
        "media_id long, payload binary, width int, height int",
    )
    rows = {
        r["media_id"]: r
        for r in resize_images(df, 2, 2, codec="png").collect()
    }
    assert bytes(rows[1]["payload"]) == _resize_nn(arr, 2, 2).tobytes()
    assert rows[2]["payload"] is None
