"""Field-operation tests (modeled on the reference's geometry tests)."""

import pytest

from dask_geomodeling_spark.geometry import field_operations as fo
from dask_geomodeling_spark.geometry.sources import LiteralGeometrySource


@pytest.fixture(scope="module")
def src():
    return LiteralGeometrySource([
        {"id": 1, "v": 2.0, "w": 4.0, "b": True},
        {"id": 2, "v": 5.0, "w": 2.0, "b": False},
        {"id": 3, "v": 9.0, "w": None, "b": True},
    ])


def values(spark, block, col):
    return dict((r["id"], r[col])
                for r in block.plan(spark).collect())


def test_arithmetic(spark, src):
    view = src.set(
        "add", fo.Add(src["v"], src["w"]),
        "sub", fo.Subtract(src["v"], 1.0),
        "mul", fo.Multiply(src["v"], 2.0),
        "div", fo.Divide(src["v"], src["w"]),
        "fdiv", fo.FloorDivide(src["v"], 2.0),
        "pow", fo.Power(src["v"], 2.0),
        "mod", fo.Modulo(src["v"], 3.0),
    )
    rows = {r.id: r for r in view.plan(spark).collect()}
    assert rows[1].add == 6.0 and rows[3].add is None
    assert rows[2].sub == 4.0
    assert rows[2].mul == 10.0
    assert rows[1].div == 0.5
    assert rows[2].fdiv == 2
    assert rows[3].pow == 81.0
    assert rows[2].mod == 2.0


def test_comparisons_and_logic(spark, src):
    view = src.set(
        "gt", fo.Greater(src["v"], 4.0),
        "both", fo.And(fo.Greater(src["v"], 1.0), src["b"]),
        "inv", fo.Invert(src["b"]),
    )
    rows = {r.id: r for r in view.plan(spark).collect()}
    assert rows[1].gt is False and rows[2].gt is True
    assert rows[1].both is True and rows[2].both is False
    assert rows[1].inv is False


def test_classify_open_and_closed(spark, src):
    open_b = src.set("c", fo.Classify(src["v"], [3.0, 6.0], ["a", "b", "c"]))
    got = values(spark, open_b, "c")
    assert got == {1: "a", 2: "b", 3: "c"}
    closed = src.set("c", fo.Classify(src["v"], [3.0, 6.0], ["mid"]))
    got = values(spark, closed, "c")
    assert got == {1: None, 2: "mid", 3: None}


def test_classify_right_false(spark, src):
    block = src.set("c", fo.Classify(src["v"], [2.0, 9.0], ["lo", "mid", "hi"]),
                    "d", fo.Classify(src["v"], [2.0, 9.0], ["lo", "mid", "hi"],
                                     right=False))
    rows = {r.id: r for r in block.plan(spark).collect()}
    assert rows[1].c == "lo"    # 2.0 <= 2.0 (right-closed)
    assert rows[1].d == "mid"   # 2.0 >= 2.0 (left-closed)
    assert rows[3].c == "mid"   # 9.0 <= 9.0
    assert rows[3].d == "hi"


def test_classify_from_columns(spark):
    src = LiteralGeometrySource([
        {"id": 1, "v": 5.0, "lo": 1.0, "hi": 10.0},
        {"id": 2, "v": 5.0, "lo": 6.0, "hi": 10.0},
        {"id": 3, "v": 50.0, "lo": 1.0, "hi": 10.0},
    ])
    block = src.set("c", fo.ClassifyFromColumns(
        src, "v", ["lo", "hi"], ["low", "mid", "high"]))
    got = {r.id: r.c for r in block.plan(spark).collect()}
    assert got == {1: "mid", 2: "low", 3: "high"}


def test_where_mask(spark, src):
    block = src.set(
        "wh", fo.Where(src["v"], fo.Greater(src["v"], 4.0), -1.0),
        "mk", fo.Mask(src["v"], fo.Greater(src["v"], 4.0), -1.0),
    )
    rows = {r.id: r for r in block.plan(spark).collect()}
    assert rows[1].wh == -1.0 and rows[2].wh == 5.0
    assert rows[1].mk == 2.0 and rows[2].mk == -1.0


def test_round(spark):
    src = LiteralGeometrySource([{"id": 1, "v": 2.345}, {"id": 2, "v": 2.5}])
    block = src.set("r", fo.Round(src["v"], 1), "r0", fo.Round(src["v"]))
    rows = {r.id: r for r in block.plan(spark).collect()}
    assert rows[1].r == 2.3
    assert rows[2].r0 == 2.0  # banker's rounding like np.around


def test_interp(spark, src):
    block = src.set("i", fo.Interp(src["v"], [0.0, 10.0], [0.0, 100.0]))
    got = values(spark, block, "i")
    assert got == {1: 20.0, 2: 50.0, 3: 90.0}


def test_interp_bounds(spark):
    src = LiteralGeometrySource([{"id": 1, "v": -5.0}, {"id": 2, "v": 50.0}])
    block = src.set("i", fo.Interp(src["v"], [0.0, 10.0], [0.0, 100.0],
                                   left=-1.0, right=-2.0))
    got = values(spark, block, "i")
    assert got == {1: -1.0, 2: -2.0}


def test_choose(spark, src):
    idx = fo.Subtract(src["id"], 1)  # 0, 1, 2
    block = src.set("c", fo.Choose(idx, src["v"], src["w"], src["v"]))
    got = values(spark, block, "c")
    assert got == {1: 2.0, 2: 2.0, 3: 9.0}


def test_series_operator_sugar(spark, src):
    """Reference geometry/base.py:111-196: the full dunder set builds
    field-operation blocks."""
    v, w = src["v"], src["w"]
    assert isinstance(-v, fo.Multiply)
    assert isinstance(v // 2.0, fo.FloorDivide)
    assert isinstance(v % 3.0, fo.Modulo)
    assert isinstance(v ** 2.0, fo.Power)
    assert isinstance(v == w, fo.Equal)
    assert isinstance(v != w, fo.NotEqual)
    assert isinstance(v > w, fo.Greater)
    assert isinstance(v >= w, fo.GreaterEqual)
    assert isinstance(v < w, fo.Less)
    assert isinstance(v <= w, fo.LessEqual)
    flag = v > 3.0
    assert isinstance(~flag, fo.Invert)
    assert isinstance(flag & (w > 3.0), fo.And)
    assert isinstance(flag | (w > 3.0), fo.Or)
    assert isinstance(flag ^ (w > 3.0), fo.Xor)
    # identity hashing survives the __eq__ override
    assert len({v, v}) == 1

    view = src.set(
        "neg", -v,
        "fdiv", v // 2.0,
        "sq", v ** 2.0,
        "hot", (v > 3.0) & ~(v >= 9.0),
    )
    rows = {r.id: r for r in view.plan(spark).collect()}
    assert rows[1].neg == -2.0
    assert rows[2].fdiv == 2.0
    assert rows[3].sq == 81.0
    assert rows[2].hot is True and rows[3].hot is False


def test_buffer_columns_contract_matches_built_frame(spark):
    # round-6 ADVICE: 'vertices' is only advertised when the point
    # branch will actually materialize it (bbox sources take the bbox
    # branch and never build the ring)
    from dask_geomodeling_spark.geometry.constructive import Buffer
    from dask_geomodeling_spark.geometry.sources import (
        LiteralGeometrySource)
    box = LiteralGeometrySource([
        {"id": 1, "xmin": 0.0, "ymin": 0.0, "xmax": 4.0, "ymax": 4.0}])
    pt = LiteralGeometrySource([{"id": 1, "x": 1.0, "y": 2.0}])
    for src in (box, pt):
        blk = Buffer(src, 1.0, shape="round")
        built = set(blk.plan(spark).columns)
        assert ("vertices" in blk.columns) == ("vertices" in built)
    assert "vertices" not in Buffer(box, 1.0, shape="round").columns
    assert "vertices" in Buffer(pt, 1.0, shape="round").columns
