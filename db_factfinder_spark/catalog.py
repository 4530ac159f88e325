"""Variable catalog — the engine's "query plan" source of truth.

The reference drives every computation from three JSON catalogs per
(source, year) — metadata.json / median.json / special.json
(/root/reference/factfinder/metadata.py:63-82).  A "query" is a pair
``(pff_variable, geotype)`` resolved against this catalog into a
dataflow plan.  The catalog is tiny (~1k entries) so it lives on the
driver as plain Python and *shapes* the lazy DataFrame plan; it is never
shipped as data (except optionally broadcast for semi-join filters).

JSON layouts (identical to the reference's data files):

* metadata.json: ``[{pff_variable, base_variable, census_variable:
  [...], domain, rounding, category}, ...]``
* median.json: ``{var: {design_factor, top_coding, bottom_coding,
  ranges: {input_var: [lower, upper], ...}}, ...}`` — bin order is dict
  insertion order (metadata.py:127-152).
* special.json: ``[{pff_variable, base_variables: [...]}, ...]``
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from functools import cached_property
from pathlib import Path


@dataclass
class Variable:
    """One derived-variable descriptor (reference metadata.py:6-41)."""

    pff_variable: str
    census_variable: list[str]
    base_variable: str = "nan"
    domain: str = ""
    rounding: int = 0
    category: str = ""
    meta: dict = field(default_factory=dict)

    @property
    def census_variables(self) -> tuple[list[str], list[str], list[str], list[str]]:
        """E/M/PE/PM source-column names for this variable.

        Decennial variables (names starting with ``P``) carry no E/M
        suffix — the raw name is the estimate and the margin is undefined
        (metadata.py:16-29).
        """
        E = [v + "E" for v in self.census_variable if v[0] != "P"]
        if not E:  # decennial-only: raw names are the estimates
            E = list(self.census_variable)
        M = [v + "M" for v in self.census_variable if v[0] != "P"]
        PE = [v + "PE" for v in self.census_variable if v[0] != "P"]
        PM = [v + "PM" for v in self.census_variable if v[0] != "P"]
        return E, M, PE, PM


@dataclass
class MedianSpec:
    """Grouped-median descriptor (reference metadata.py:127-152)."""

    pff_variable: str
    design_factor: float
    top_coding: bool
    bottom_coding: bool
    # ordered: [(input_variable, lower, upper), ...] in bin order
    bins: list[tuple[str, float, float]]

    @property
    def input_variables(self) -> list[str]:
        return [b[0] for b in self.bins]


@dataclass
class SpecialSpec:
    """Special-variable descriptor (reference metadata.py:154-160)."""

    pff_variable: str
    base_variables: list[str]


# Variables whose numerator is a DP (data profile) census variable but
# whose published base differs from the census profile's base — these
# are *not* treated as profile-only (reference metadata.py:50-61).
PROFILE_ONLY_EXCEPTIONS = [
    "abroad",
    "cvlfuem2",
    "dfhsdfcnt",
    "dfhssmcnt",
    "dfhsus",
    "hh5",
    "oochu4",
    "p65plbwpv",
    "pbwpv",
    "pu18bwpv",
]


class Catalog:
    """Loads and classifies the variable catalog for one (source, year).

    Mirrors the accessor surface of the reference's ``Metadata`` class
    (metadata.py:44-168) but over explicit paths so tests can supply
    their own fixture catalogs.
    """

    def __init__(
        self,
        metadata_path: str | Path,
        median_path: str | Path | None = None,
        special_path: str | Path | None = None,
        source: str = "acs",
        year: int = 2019,
    ):
        self.source = source
        self.year = year
        self._metadata_path = Path(metadata_path)
        self._median_path = Path(median_path) if median_path else None
        self._special_path = Path(special_path) if special_path else None

    @classmethod
    def from_registry(cls, source: str, year: int) -> "Catalog":
        """Load a catalog vintage packaged with the engine — the
        ``data/{source}/{year}/*.json`` registry layout of the
        reference (metadata.py:63-82).  Packaged: the decennial 2010
        and 2020 vintages (25 variables each; identical variable
        lists, only the ``decennial_pop`` entry's bookkeeping key
        differs) and the ACS 2010/2018/2019/2020/2021 vintages
        (reference data/acs/<year>/ — 2020 ships empty median/special
        sidecars; 2021 ships metadata WITHOUT census columns and is
        consumable only by the manual-update pipeline, exactly like
        the reference).  Unpackaged vintages are supplied by explicit
        paths."""
        root = Path(__file__).parent / "data" / source / str(year)
        meta = root / "metadata.json"
        if not meta.exists():
            data_dir = Path(__file__).parent / "data"
            available = sorted(
                f"{p.parent.parent.name}/{p.parent.name}"
                for p in data_dir.glob("*/*/metadata.json")
            )
            raise ValueError(
                f"no packaged catalog for source={source!r} year={year}"
                f" (packaged: {available}); pass explicit paths to"
                " Catalog(...) for unpackaged vintages"
            )
        median = root / "median.json"
        special = root / "special.json"
        return cls(
            meta,
            median if median.exists() else None,
            special if special.exists() else None,
            source=source,
            year=year,
        )

    # ---- raw loads -------------------------------------------------
    @cached_property
    def metadata(self) -> list[dict]:
        with open(self._metadata_path) as f:
            return json.load(f)

    @cached_property
    def median(self) -> dict:
        if self._median_path is None:
            return {}
        with open(self._median_path) as f:
            return json.load(f)

    @cached_property
    def special(self) -> list[dict]:
        if self._special_path is None:
            return []
        with open(self._special_path) as f:
            return json.load(f)

    # ---- classification (metadata.py:84-160 semantics) -------------
    @cached_property
    def profile_only_variables(self) -> list[str]:
        # The reference never computes this for decennial catalogs
        # (calculate.py:103 guards the only call site) — and its
        # ``census_variable[0]`` would crash on the decennial entries
        # whose census_variable list is empty.  Replicate the effective
        # behavior: decennial → no profile-only variables; skip
        # column-less entries defensively elsewhere.
        if self.source == "decennial":
            return []
        return [
            m["pff_variable"]
            for m in self.metadata
            if (
                m["census_variable"]
                and m["census_variable"][0][0:2] == "DP"
                and len(m["census_variable"]) == 1
                and m["pff_variable"] not in PROFILE_ONLY_EXCEPTIONS
            )
        ]

    @cached_property
    def base_variables(self) -> list[str]:
        return list({m["base_variable"] for m in self.metadata})

    @cached_property
    def median_variables(self) -> list[str]:
        return list(self.median.keys())

    @cached_property
    def median_inputs(self) -> list[str]:
        return [
            input_var
            for var in self.median
            for input_var in self.median[var]["ranges"].keys()
        ]

    @cached_property
    def special_variables(self) -> list[str]:
        return [s["pff_variable"] for s in self.special]

    # ---- accessors --------------------------------------------------
    def create_variable(self, pff_variable: str) -> Variable:
        for m in self.metadata:
            if m["pff_variable"] == pff_variable:
                return Variable(
                    pff_variable=m["pff_variable"],
                    census_variable=list(m["census_variable"]),
                    base_variable=str(m.get("base_variable", "nan")),
                    domain=m.get("domain", ""),
                    rounding=int(m.get("rounding", 0)),
                    category=m.get("category", ""),
                    meta=m,
                )
        raise KeyError(f"unknown pff_variable: {pff_variable}")

    def median_spec(self, pff_variable: str) -> MedianSpec:
        m = self.median[pff_variable]
        return MedianSpec(
            pff_variable=pff_variable,
            design_factor=float(m["design_factor"]),
            top_coding=bool(m["top_coding"]),
            bottom_coding=bool(m["bottom_coding"]),
            bins=[(k, float(v[0]), float(v[1])) for k, v in m["ranges"].items()],
        )

    def special_spec(self, pff_variable: str) -> SpecialSpec:
        for s in self.special:
            if s["pff_variable"] == pff_variable:
                return SpecialSpec(
                    pff_variable=pff_variable,
                    base_variables=list(s["base_variables"]),
                )
        raise KeyError(f"unknown special variable: {pff_variable}")
