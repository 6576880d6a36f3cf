"""MP4/ISO-BMFF container parsing (operators/video_meta.py)."""

from geoparser_spark.operators.video_meta import (
    extract_video_spans,
    make_mini_mp4,
    parse_mp4,
)


def test_dims_duration_and_tags():
    b = make_mini_mp4(640, 360, 12345, titles=["My Clip", "tag two"])
    assert parse_mp4(b) == ("isom", 640, 360, 12345, ["My Clip", "tag two"])
    spans = extract_video_spans(b)
    assert spans[0] == ("video", None, "vid://isom/640x360/12345ms")
    assert [s[1] for s in spans[1:]] == ["My Clip", "tag two"]


def test_nonstandard_timescale_rounds_exactly():
    b = make_mini_mp4(1920, 1080, 60000, timescale=90000)
    assert parse_mp4(b)[3] == 60000


def test_audio_only_and_brand():
    b = make_mini_mp4(0, 0, 5000, brand="mp42")
    assert parse_mp4(b) == ("mp42", 0, 0, 5000, [])


def test_damage_degrades_empty():
    assert extract_video_spans(b"not an mp4") == []
    assert extract_video_spans(b"") == []
    good = make_mini_mp4(64, 64, 1000)
    assert parse_mp4(good[:20]) is None          # truncated mid-box
    # a box SIZE pointing past EOF must not loop or raise: corrupt the
    # moov box's size field (moov starts right after the 20-byte ftyp)
    assert parse_mp4(good[:20] + b"\xff\xff\xff\xff" + good[24:]) is None
    # garbage in a box BODY (the brand) degrades to a replaced string,
    # never an exception
    assert parse_mp4(good[:8] + b"\xff\xff\xff\xff" + good[12:])[1:] == \
        (64, 64, 1000, [])


def test_video_kind_through_spark_extract(spark):
    import base64

    from geoparser_spark.operators.extract import extract

    payload = base64.b64encode(
        make_mini_mp4(320, 240, 2500, titles=["hello video"])).decode()
    docs = spark.createDataFrame(
        [("v1", [{"kind": "video_bytes", "text": payload,
                  "media_ref": None, "offset": 0}])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    got = sorted(
        extract(docs).select("doc_id", "spans").collect()[0].spans,
        key=lambda s: s.order)
    assert (got[0].kind, got[0].media_ref) == (
        "video", "vid://isom/320x240/2500ms")
    assert (got[1].kind, got[1].text) == ("text", "hello video")
