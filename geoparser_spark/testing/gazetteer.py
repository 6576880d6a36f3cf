"""Mini-GeoNames gazetteer fixture (~200 rows).

Column layout follows the public GeoNames ``allCountries.txt`` dump that
the reference Lucene-indexes (reference: README.md:60-66,
Docker/Dockerfile:46-48).  Includes the documented fixture places:

* "Texas"    — US ADM1 *and* the naive gazetteer top-hit at
               (18.05333, -91.92139) (reference: README.md:69-82).
* "Pasadena" — US PPL (California) and the top-hit at
               (4.6964, -74.06446) (reference: README.md:69-82).
* "United States" PCLI at (39.76, -98.5) and "China" with the ambiguous
  alternative at (27.33931, -108.60288) (reference: README.md:98-115,
  the polar.geot golden output).

Plus ~190 deterministic synthetic places spread over a few synthetic
countries, including multi-word names, so the n-gram tagger and the
admin-hierarchy disambiguation scoring have non-trivial work.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

from geoparser_spark.schemas import GAZETTEER

# Hand-pinned rows (values per reference README fixtures).
_FIXTURE_ROWS: list[dict] = [
    # --- Texas ambiguity (README.md:69-82) ---
    dict(geonameid=4736286, name="Texas", asciiname="Texas", alternatenames="State of Texas",
         latitude=31.25044, longitude=-99.25061, feature_class="A", feature_code="ADM1",
         country_code="US", admin1_code="TX", admin2_code="", population=22875689,
         timezone="America/Chicago"),
    dict(geonameid=3516809, name="Texas", asciiname="Texas", alternatenames="",
         latitude=18.05333, longitude=-91.92139, feature_class="P", feature_code="PPL",
         country_code="MX", admin1_code="27", admin2_code="", population=0,
         timezone="America/Mexico_City"),
    # --- Pasadena ambiguity (README.md:69-82) ---
    dict(geonameid=5381396, name="Pasadena", asciiname="Pasadena", alternatenames="",
         latitude=34.14778, longitude=-118.14452, feature_class="P", feature_code="PPL",
         country_code="US", admin1_code="CA", admin2_code="037", population=141029,
         timezone="America/Los_Angeles"),
    dict(geonameid=3672778, name="Pasadena", asciiname="Pasadena", alternatenames="",
         latitude=4.6964, longitude=-74.06446, feature_class="P", feature_code="PPL",
         country_code="CO", admin1_code="34", admin2_code="", population=0,
         timezone="America/Bogota"),
    # --- polar.geot pair (README.md:98-115) ---
    dict(geonameid=6252001, name="United States", asciiname="United States",
         alternatenames="USA,United States of America",
         latitude=39.76, longitude=-98.5, feature_class="A", feature_code="PCLI",
         country_code="US", admin1_code="00", admin2_code="", population=327167434,
         timezone=""),
    dict(geonameid=1814991, name="China", asciiname="China",
         alternatenames="People's Republic of China,PRC",
         latitude=35.0, longitude=105.0, feature_class="A", feature_code="PCLI",
         country_code="CN", admin1_code="00", admin2_code="", population=1411778724,
         timezone="Asia/Shanghai"),
    dict(geonameid=4024460, name="China", asciiname="China", alternatenames="",
         latitude=27.33931, longitude=-108.60288, feature_class="P", feature_code="PPL",
         country_code="MX", admin1_code="25", admin2_code="", population=0,
         timezone="America/Mazatlan"),
    # --- supporting admin rows for co-mention scoring ---
    dict(geonameid=5332921, name="California", asciiname="California", alternatenames="",
         latitude=37.25022, longitude=-119.75126, feature_class="A", feature_code="ADM1",
         country_code="US", admin1_code="CA", admin2_code="", population=37691912,
         timezone="America/Los_Angeles"),
    dict(geonameid=3996063, name="Mexico", asciiname="Mexico",
         alternatenames="United Mexican States",
         latitude=23.0, longitude=-102.0, feature_class="A", feature_code="PCLI",
         country_code="MX", admin1_code="00", admin2_code="", population=126190788,
         timezone=""),
    dict(geonameid=3686110, name="Colombia", asciiname="Colombia",
         alternatenames="Republic of Colombia",
         latitude=4.0, longitude=-72.0, feature_class="A", feature_code="PCLI",
         country_code="CO", admin1_code="00", admin2_code="", population=49648685,
         timezone=""),
]

_PREFIXES = [
    "Ald", "Bren", "Cal", "Dor", "Elm", "Fen", "Gor", "Hal", "Ist", "Jun",
    "Kel", "Lor", "Mar", "Nor", "Ost", "Pel", "Quin", "Ros", "Sel", "Tor",
]
_SUFFIXES = ["wick", "ford", "holm", "stad", "mere", "ton", "dale", "port", "gate", "field"]
_MULTI_FIRST = ["New", "Port", "Lake", "Mount", "Saint"]
_MULTI_THIRD = ["Bay", "Falls", "Heights", "Springs"]

# Synthetic countries: (PCLI name, ISO code, base geonameid, lat, lon)
_SYNTH_COUNTRIES = [
    ("Avaloria", "AV", 9100000, 48.0, 12.0),
    ("Borduria", "BD", 9200000, 44.0, 24.0),
    ("Cascadia", "CS", 9300000, 46.0, -122.0),
    ("Drovenia", "DR", 9400000, 52.0, 18.0),
]


def gazetteer_rows(seed: int = 42) -> list[dict]:
    """All mini-gazetteer rows: fixtures + deterministic synthetics."""
    rng = random.Random(seed)
    rows = list(_FIXTURE_ROWS)
    used_names = {r["name"] for r in rows}
    # long official-style alternatenames (4 and 5 tokens) so the
    # MAX_NGRAM=5 surface join has fixture coverage, GeoNames-style
    _LONG_ALTS = {
        "Avaloria": "Free State of Avaloria",
        "Borduria": "Grand Duchy of Upper Borduria",
    }
    for cname, cc, base, clat, clon in _SYNTH_COUNTRIES:
        rows.append(dict(
            geonameid=base, name=cname, asciiname=cname,
            alternatenames=_LONG_ALTS.get(cname, ""),
            latitude=clat, longitude=clon, feature_class="A", feature_code="PCLI",
            country_code=cc, admin1_code="00", admin2_code="",
            population=rng.randint(1_000_000, 80_000_000), timezone=""))
        # two admin1 regions per country
        for a in range(2):
            aname = f"{_PREFIXES[(base // 100000 + a) % len(_PREFIXES)]}ia {cname[:4]}"
            rows.append(dict(
                geonameid=base + 1 + a, name=aname, asciiname=aname, alternatenames="",
                latitude=clat + a, longitude=clon + a, feature_class="A",
                feature_code="ADM1", country_code=cc, admin1_code=f"0{a+1}",
                admin2_code="", population=rng.randint(100_000, 5_000_000),
                timezone=""))
    # ~45 towns per country, deterministic names; a few are ambiguous
    # (same name in two countries) and a few are multi-word.
    gid = 9500000
    for ci, (cname, cc, base, clat, clon) in enumerate(_SYNTH_COUNTRIES):
        for i in range(45):
            p = _PREFIXES[(i * 7 + ci) % len(_PREFIXES)]
            s = _SUFFIXES[(i * 3 + ci) % len(_SUFFIXES)]
            name = p + s
            if i % 9 == 7:  # multi-word (2 tokens)
                name = f"{_MULTI_FIRST[i % len(_MULTI_FIRST)]} {name}"
            if i % 15 == 11:  # multi-word (3 tokens)
                name = f"{name} {_MULTI_THIRD[i % len(_MULTI_THIRD)]}"
            rows.append(dict(
                geonameid=gid, name=name, asciiname=name, alternatenames="",
                latitude=round(clat + (i % 10) * 0.37 - 1.5, 5),
                longitude=round(clon + (i // 10) * 0.53 - 1.0, 5),
                feature_class="P",
                feature_code="PPLA" if i % 20 == 0 else "PPL",
                country_code=cc,
                admin1_code=f"0{1 + (i % 2)}",
                admin2_code="",
                population=rng.randint(0, 900_000),
                timezone=""))
            gid += 1
            used_names.add(name)
    return rows


def gazetteer_df(spark: SparkSession, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(gazetteer_rows(seed), schema=GAZETTEER)


def big_gazetteer_df(spark: SparkSession, n: int = 200_000) -> DataFrame:
    """Synthetic gazetteer at GeoNames-like scale, generated NATIVELY
    (spark.range + expressions — no driver-side lists) so scale tests
    can exercise the broadcast tag join with 10^5-10^6 surface forms.
    The real allCountries.txt is ~12M rows; build_surface_forms
    projects it to (surface, n_tokens, geonameid) before the broadcast
    — the design the plan-shape test pins."""
    from pyspark.sql import functions as F

    syllA = F.element_at(
        F.array(*[F.lit(s) for s in
                  ("bran", "cold", "dun", "east", "fair", "grim", "hazel",
                   "iron", "jade", "kiln", "long", "mill")]),
        (F.col("id") % 12 + 1).cast("int"),
    )
    syllB = F.element_at(
        F.array(*[F.lit(s) for s in
                  ("field", "ford", "gate", "holm", "keep", "mark", "ness",
                   "port", "stead", "ton", "vale", "wick")]),
        (F.pmod(F.col("id") / 12, F.lit(12)).cast("int") + 1),
    )
    name = F.initcap(F.concat(syllA, syllB, F.lit(" "), (F.col("id") % 9973).cast("string")))
    return spark.range(n).select(
        (F.col("id") + 10_000_000).alias("geonameid"),
        name.alias("name"),
        name.alias("asciiname"),
        F.lit("").alias("alternatenames"),
        (F.pmod(F.col("id") * 0.137, F.lit(180.0)) - 90).alias("latitude"),
        (F.pmod(F.col("id") * 0.291, F.lit(360.0)) - 180).alias("longitude"),
        F.lit("P").alias("feature_class"),
        F.when(F.col("id") % 50 == 0, "PPLA").otherwise("PPL").alias("feature_code"),
        F.concat(F.lit("C"), (F.col("id") % 60).cast("string")).alias("country_code"),
        F.concat(F.lit("0"), (F.col("id") % 7).cast("string")).alias("admin1_code"),
        F.lit("").alias("admin2_code"),
        (F.col("id") % 1_000_000).alias("population"),
        F.lit("").alias("timezone"),
    )


def write_geonames_tsv(path: str, seed: int = 42) -> None:
    """Write the fixture in the 19-column allCountries.txt TSV layout so
    sources/geonames.py can be tested against the real dump format."""
    with open(path, "w", encoding="utf-8") as f:
        for r in gazetteer_rows(seed):
            cols = [
                str(r["geonameid"]), r["name"], r["asciiname"], r["alternatenames"],
                str(r["latitude"]), str(r["longitude"]), r["feature_class"],
                r["feature_code"], r["country_code"], "", r["admin1_code"],
                r["admin2_code"], "", "", str(r["population"]), "", "0",
                r["timezone"], "2026-01-01",
            ]
            f.write("\t".join(cols) + "\n")
