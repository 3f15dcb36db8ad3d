"""Hypothesis property tests for the numerics and cache semantics."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from qrapids_forecast_r_script_spark.forecast.cache import (
    FORECASTS_CACHE_LENGTH, ForecastStore)
from qrapids_forecast_r_script_spark.forecast.dispatch import (fit_method,
                                                               forecast_fitted)
from qrapids_forecast_r_script_spark.functions.scrub import clean_key

series_strategy = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
              allow_infinity=False),
    min_size=8, max_size=80)


@settings(max_examples=25, deadline=None)
@given(y=series_strategy, freq=st.sampled_from([1, 4, 7, 12]),
       horizon=st.integers(1, 20))
def test_closed_forms_bands_ordered_any_series(y, freq, horizon):
    y = np.asarray(y)
    for method in ("MEAN", "NAIVE", "SNAIVE", "DRIFT"):
        b = forecast_fitted(fit_method(method, y, freq), horizon)
        assert len(b["mean"]) == horizon
        eps = 1e-6 * (1 + np.abs(b["mean"]).max())
        assert np.all(b["lower2"] <= b["lower1"] + eps)
        assert np.all(b["upper1"] <= b["upper2"] + eps)


@settings(max_examples=10, deadline=None)
@given(y=series_strategy)
def test_ets_finite_on_any_series(y):
    y = np.asarray(y)
    b = forecast_fitted(fit_method("ETS", y, 7), 7)
    assert np.all(np.isfinite(b["mean"]))


@settings(max_examples=30, deadline=None)
@given(name=st.text(min_size=0, max_size=40))
def test_clean_key_matches_reference_charset(name):
    """gsub("[^[:alnum:] ]", "", name) (R:43): result contains only
    [0-9A-Za-z ] and preserves kept-character order."""
    out = clean_key(name)
    assert all(c.isascii() and (c.isalnum() or c == " ") for c in out)
    kept = [c for c in name if c.isascii() and (c.isalnum() or c == " ")]
    assert out == "".join(kept)


@settings(max_examples=10, deadline=None)
@given(h1=st.integers(1, 30), h2=st.integers(1, 30))
def test_cache_validity_monotone(tmp_path_factory, h1, h2):
    """For any pair of horizons: after priming at max(h1,14)…, validity is
    exactly the length rule (R:71)."""
    store = ForecastStore(str(tmp_path_factory.mktemp("fs")))
    t = np.arange(40)
    pdf = pd.DataFrame({
        "name": "m", "index": "i",
        "evaluationDate": pd.date_range("2024-01-01", periods=40).date,
        "value": 10 + 0.1 * t,
    })
    store.forecast_with_cache("m", "i", "MEAN", 7, h1, lambda: pdf)
    cached_len = max(h1, FORECASTS_CACHE_LENGTH) if h1 > FORECASTS_CACHE_LENGTH \
        else FORECASTS_CACHE_LENGTH
    assert len(store.load_forecast("m", "i", "MEAN")["mean"]) == cached_len
    assert store.forecast_cache_valid("m", "i", "MEAN", h2) == (h2 <= cached_len)


@settings(max_examples=60, deadline=None)
@given(zs=st.lists(st.integers(1, 10_000), min_size=1, max_size=40))
def test_croston_integer_scaling_identity(zs):
    """The algebra `forecast_croston_events` is built on (any integer
    demand sequence, any length): the alpha=1/2 SES recursion
    l_k = (y_k + l_{k-1}) / 2 with l_1 = y_1, scaled by 2^(k-1), is
    EXACTLY the integer  y_1 + sum_{j=2..k} 2^(j-2) y_j  — and with
    the operator's 24-demand cap the weights stay <= 2^22, so the
    BIGINT sums can never overflow for any series length."""
    cap = 24
    kept = zs[-cap:]
    k = len(kept)
    l = float(kept[0])
    for y in kept[1:]:
        l = 0.5 * y + 0.5 * l
    num = kept[0] + sum((1 << (j - 2)) * kept[j - 1]
                        for j in range(2, k + 1))
    assert num <= (1 << 22) * 10_000 * 24      # BIGINT-safe bound
    # exact: num / 2^(k-1) is a dyadic rational, l is the same value
    assert l == num / (1 << (k - 1))


@given(w=st.integers(min_value=1, max_value=2 ** 31 - 1),
       h=st.integers(min_value=1, max_value=2 ** 31 - 1))
@settings(max_examples=200, deadline=None)
def test_png_header_roundtrip_any_dims(w, h):
    """parse_image_header inverts make_png over the full PNG dimension
    domain (widths/heights are unsigned 31-bit per the PNG spec)."""
    from qrapids_forecast_r_script_spark.operators.multimodal import (
        make_png, parse_image_header)
    meta = parse_image_header(make_png(w, h))
    assert (meta["format"], meta["width"], meta["height"]) == ("png", w, h)


@given(w=st.integers(min_value=1, max_value=2 ** 15 - 1),
       h=st.integers(min_value=-(2 ** 15 - 1), max_value=2 ** 15 - 1).filter(lambda v: v != 0))
@settings(max_examples=200, deadline=None)
def test_bmp_header_roundtrip_any_dims(w, h):
    """parse_image_header inverts make_bmp, including top-down rows
    (negative stored height reports |height| — the BITMAPINFOHEADER
    convention)."""
    from qrapids_forecast_r_script_spark.operators.multimodal import (
        make_bmp, parse_image_header)
    meta = parse_image_header(make_bmp(w, h))
    assert (meta["format"], meta["width"], meta["height"]) == ("bmp", w, abs(h))


@given(payload=st.binary(max_size=64))
@settings(max_examples=300, deadline=None)
def test_image_header_parser_total_on_garbage(payload):
    """The parser is TOTAL over arbitrary bytes: it either returns a
    well-formed meta dict or raises ValueError — never IndexError,
    struct.error, or a silent wrong answer shape."""
    from qrapids_forecast_r_script_spark.operators.multimodal import (
        parse_image_header)
    try:
        meta = parse_image_header(bytes(payload))
    except ValueError:
        return
    assert {"format", "width", "height"} <= set(meta)


@given(data=st.data(),
       w=st.integers(min_value=1, max_value=12),
       h=st.integers(min_value=1, max_value=10),
       c=st.sampled_from([1, 2, 3, 4]))
@settings(max_examples=120, deadline=None)
def test_png_pixel_roundtrip_all_filters(data, w, h, c):
    """decode_png_pixels inverts make_png_with_pixels for every channel
    count and every W3C filter type (the encoder applies the spec's
    FORWARD filter, the decoder the reconstruction — independent
    directions, so equality is a two-sided check).  Mode names follow
    PIL: L / LA / RGB / RGBA."""
    import numpy as np
    from qrapids_forecast_r_script_spark.operators.multimodal import (
        decode_png_pixels, make_png_with_pixels)
    px = np.array(data.draw(st.lists(
        st.integers(min_value=0, max_value=255),
        min_size=w * h * c, max_size=w * h * c)),
        dtype=np.uint8).reshape(h, w, c)
    filters = data.draw(st.lists(st.integers(min_value=0, max_value=4),
                                 min_size=1, max_size=h))
    payload = make_png_with_pixels(px, filters=filters)
    gw, gh, mode, got = decode_png_pixels(payload)
    assert (gw, gh) == (w, h)
    assert mode == {1: "L", 2: "LA", 3: "RGB", 4: "RGBA"}[c]
    np.testing.assert_array_equal(got, px)


@given(payload=st.binary(max_size=96))
@settings(max_examples=300, deadline=None)
def test_png_pixel_decoder_total_on_garbage(payload):
    """decode_png_pixels is TOTAL over arbitrary bytes: ValueError or a
    valid decode, never an unhandled exception type."""
    from qrapids_forecast_r_script_spark.operators.multimodal import (
        _PNG_SIG, decode_png_pixels)
    try:
        decode_png_pixels(_PNG_SIG + payload)
    except ValueError:
        pass
