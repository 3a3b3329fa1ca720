"""Unit tests for the parity harness's tolerance differ (scripts/parity.py;
the full REST round trip runs via `make parity`)."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.parity import diff_logs, _tokens_match


class TestTokensMatch:
    def test_exact(self):
        assert _tokens_match("0: Stars 10 HFR 4.83", "0: Stars 10 HFR 4.83")

    def test_numeric_tolerance(self):
        assert _tokens_match("Location 100.0152 Scale 2.0396",
                             "Location 100.0161 Scale 2.0405")

    def test_star_count_change_fails(self):
        assert not _tokens_match("0: Stars 10 HFR 4.83", "0: Stars 9 HFR 4.83")

    def test_text_change_fails(self):
        assert not _tokens_match("0: Loaded 256x256 image", "0: Loaded 256x256 frame")

    def test_signed_transform_tokens(self):
        a = "3: Transform x'=0.99984x +0.00015y +4.00, y'=-0.00001x +1.00008y -3.02; residual 0.0188 oob nan"
        b = "3: Transform x'=0.99985x +0.00014y +4.00, y'=-0.00001x +1.00008y -3.03; residual 0.0190 oob nan"
        assert _tokens_match(a, b)

    def test_residual_regression_fails(self):
        a = "3: Transform x'=1.00000x +0.00000y +4.00, y'=0.00000x +1.00000y -3.00; residual 0.01 oob nan"
        b = "3: Transform x'=1.00000x +0.00000y +4.00, y'=0.00000x +1.00000y -3.00; residual 0.90 oob nan"
        assert not _tokens_match(a, b)


class TestDiffLogs:
    def test_identical(self):
        log = "a\nb\nc\n"
        assert diff_logs(log, log) == []

    def test_order_insensitive(self):
        assert diff_logs("a\nb\n", "b\na\n") == []

    def test_missing_line_reported(self):
        out = diff_logs("a\n", "a\nb\n")
        assert out == ["- b"]

    def test_extra_line_reported(self):
        out = diff_logs("a\nb\n", "a\n")
        assert out == ["+ b"]

    def test_tolerant_numbers(self):
        assert diff_logs("Mean 100.2242\n", "Mean 100.2250\n") == []
