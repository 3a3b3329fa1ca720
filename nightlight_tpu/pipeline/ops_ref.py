"""Reference-frame selection, frame filtering, and stats export
(reference: internal/ops/ref/)."""

from __future__ import annotations

import threading
from enum import IntEnum

import numpy as np

from nightlight_tpu.image import Image
from nightlight_tpu.pipeline.context import Context
from nightlight_tpu.pipeline.operators import (
    OpLoad,
    Operator,
    UnaryOperator,
    materialize_all,
    register,
)


class SelRefTarget(IntEnum):
    """Reference selection target (refframe.go:32-37)."""

    Align = 0
    Histo = 1


_TARGET_STRINGS = ["alignment", "histogram"]


@register
class OpSelectReference(Operator):
    """Reference frame selection (refframe.go:41-210).

    The first promise to run materializes ALL inputs, scores them by the
    configured mode, and posts the result into the context; the remaining
    promises then hand out the already-materialized images.
    Modes: "%starsHFR" (max stars/HFR), "%location" (median location),
    "%rgb" (lum frame if 4 inputs, else starsHFR), an integer frame ID, or
    an external filename (loaded + star-detected without materializing the
    inputs).
    """

    TYPE = "selectRef"
    PARAMS = {
        "target": ("target", int(SelRefTarget.Align)),
        "mode": ("mode", "%starsHFR"),
        "star_detect": ("starDetect", None),  # OpStarDetect
    }

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self._mutex = threading.Lock()
        self._materialized: list | None = None

    def make_promises(self, ins, c):
        if not ins:
            raise ValueError(f"{self.TYPE} operator needs inputs")
        return [self._apply_single(i, ins, c) for i in range(len(ins))]

    def _have_reference(self, c: Context) -> bool:
        t = SelRefTarget(self.target)
        return (t == SelRefTarget.Align and c.align_stars is not None) or (
            t == SelRefTarget.Histo and c.match_histo is not None)

    def _apply_single(self, i: int, ins, c: Context):
        def promise():
            with self._mutex:
                if c.ref_frame_error is not None:
                    raise RuntimeError("same error")
                if self._have_reference(c):
                    materialized = self._materialized
                else:
                    try:
                        self._select_reference(ins, c)
                    except Exception as e:
                        c.ref_frame_error = e
                        raise
                    materialized = self._materialized
            if materialized is not None and i < len(materialized) and materialized[i] is not None:
                mat = materialized[i]
                materialized[i] = None  # free the reference (refframe.go:108)
                return mat
            return ins[i]()

        return promise

    def _select_reference(self, ins, c: Context) -> None:
        mode = self.mode
        file_id = None
        try:
            file_id = int(mode)
        except (TypeError, ValueError):
            pass

        # External reference file: load + detect stars, don't materialize inputs
        # (refframe.go:118-151).
        if mode not in ("%starsHFR", "%location", "%rgb") and file_id is None:
            if not mode:
                return
            promises = OpLoad(id=-3, file_name=mode).make_promises([], c)
            if self.star_detect is not None:
                promises = self.star_detect.make_promises(promises, c)
            ref_frame = promises[0]()
            self._assign_results(c, ref_frame)
            c.logf("using loaded image %d as %s reference\n", ref_frame.id,
                   _TARGET_STRINGS[self.target])
            return

        materialized, err = materialize_all(ins, c.max_threads, False)
        if err is not None:
            raise err
        self._materialized = list(materialized)

        # (L)RGB auto mode (refframe.go:159-166)
        if mode == "%rgb":
            if len(materialized) > 3:
                mode, file_id = "3", 3
            else:
                mode = "%starsHFR"

        if mode == "%starsHFR":
            ref_frame, ref_score = _select_stars_over_hfr(materialized)
        elif mode == "%location":
            ref_frame, ref_score = _select_median_loc(materialized)
        elif file_id is not None:
            if file_id < 0 or file_id >= len(materialized):
                raise ValueError(f"invalid reference file ID {file_id}")
            ref_frame, ref_score = materialized[file_id], 0.0
        else:
            raise ValueError(f"Unknown refrence selection mode '{self.mode}'")
        if ref_frame is None:
            raise ValueError("Unable to select reference image.")
        c.logf("Using image %d with score %.4g as %s reference.\n",
               ref_frame.id, ref_score, _TARGET_STRINGS[self.target])
        self._assign_results(c, ref_frame)

    def _assign_results(self, c: Context, ref_frame: Image) -> None:
        """Post reference data into the context (refframe.go:200-210)."""
        t = SelRefTarget(self.target)
        if t == SelRefTarget.Align:
            c.align_naxisn = list(ref_frame.naxisn)
            c.align_stars = ref_frame.stars
            c.align_hfr = ref_frame.hfr
        elif t == SelRefTarget.Histo:
            c.match_histo = ref_frame.stats
        else:
            c.logf("Invalid reference selection target %d, skipping.\n", self.target)


def _select_stars_over_hfr(lights):
    """Best #stars/HFR score (refframe.go:212-227)."""
    ref, score = None, -1.0
    for f in lights:
        if f is None:
            continue
        s = 0.0
        if f.stars is not None and len(f.stars) > 0 and f.hfr != 0:
            s = len(f.stars) / f.hfr
        if s > score:
            ref, score = f, s
    return ref, score


def _select_median_loc(lights):
    """Frame with location closest to the median location (refframe.go:229-258)."""
    locs = [f.stats.location for f in lights if f is not None]
    if not locs:
        raise ValueError("Unable to select reference frame with median location")
    median_loc = float(np.median(np.array(locs, np.float32)))
    best, best_d = None, float("inf")
    for f in lights:
        if f is None:
            continue
        d = (f.stats.location - median_loc) ** 2
        if d < best_d:
            best, best_d = f, d
    return best, median_loc


@register
class OpFilter(UnaryOperator):
    """Drop frames with too few stars (ref/filter.go:12-53)."""

    TYPE = "filter"
    PARAMS = {"min_stars": ("minStars", 0)}

    def apply(self, f: Image, c: Context):
        if self.min_stars <= 0:
            return f
        n = len(f.stars) if f.stars is not None else 0
        if n < self.min_stars:
            c.logf("%d: Stars=%d below threshold %d, skipping frame\n", f.id, n, self.min_stars)
            return None
        return f


@register
class OpExportStats(UnaryOperator):
    """Incremental per-frame statistics HTML report (ref/exportstats.go)."""

    TYPE = "exportStats"
    PARAMS = {"file_name": ("fileName", "out.html")}

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self._mutex = threading.Lock()

    def apply(self, f: Image, c: Context) -> Image:
        if not self.file_name:
            c.logf("%d: exportStats empty fileName\n", f.id)
            return f
        with self._mutex:
            if c.stats_processed == 0:
                self._write_header(c)
            self._write_stats(f, c)
            c.stats_processed += 1
            if c.stats_processed == c.stats_total:
                self._write_footer(c)
        return f

    def _write_header(self, c: Context) -> None:
        c.logf("Writing statistics header to file %s ...\n", self.file_name)
        c.stats_file = open(self.file_name, "w")
        c.stats_file.write(_SESSION_STATS_HEADER)
        c.stats_file.write("[  ['ID','Min','Mean','Max','Location','Scale','Stars','HFR']\n")

    def _write_stats(self, f: Image, c: Context) -> None:
        c.logf("%d: writing statistics to file %s ...\n", f.id, self.file_name)
        s = f.stats
        n_stars = len(f.stars) if f.stars is not None else 0
        c.stats_file.write(
            "  ,[%d,%f,%f,%f,%f,%f,%d,%f]\n"
            % (f.id, s.min, s.mean, s.max, s.location, s.scale, n_stars, f.hfr))

    def _write_footer(self, c: Context) -> None:
        c.logf("Writing statistics footer to file %s ...\n", self.file_name)
        c.stats_file.write("]")
        c.stats_file.write(_SESSION_STATS_TRAILER)
        c.stats_file.close()
        c.stats_file = None


# Interactive chart page around the data rows (exportstats.go:119-226).
_SESSION_STATS_HEADER = """<html>
  <head>
    <script type="text/javascript" src="https://www.gstatic.com/charts/loader.js"></script>
  </head>
  <body>
    <table height="100%" width="100%"><tr height="100%">
      <td width="90%"><div id="sessionStatsChart" style="width: 100%; height: 100%"></div></td>
      <td width="10%"><form><input type="checkbox" id="normalize" name="normalize" checked="true" onchange="toggleNormalize()"><label for="normalize">Normalize</label></form></td>
    </tr></table>
  </body>
  <script type="text/javascript">
google.charts.load('current', {'packages':['corechart']});
google.charts.setOnLoadCallback(drawChart);

var dataArray =
"""

_SESSION_STATS_TRAILER = """;

function sortByFirstElement(a, b) {
	return a[0] - b[0];
}
dataHeader=dataArray[0];
dataRows=dataArray.slice(1);
dataRows.sort(sortByFirstElement);
dataArray = [dataHeader].concat(dataRows);

var columnMedians=calcColumnMedians(dataArray);
var normDataArray=normalizeYAxisValues(dataArray, columnMedians);
var normalizeCheckbox=document.getElementById('normalize');

function getData() {
  return normalizeCheckbox.checked ? normDataArray : dataArray;
}

var options = {
  title: 'Session statistics',
  explorer: {
    axis: 'horizontal',
    action: ['dragToPan'],
    keepInBounds: true,
    maxZoomIn: 0.001,
    maxZoomOut: 1.0
  },
  crosshair: { trigger: 'both' },
  legend: { position: 'bottom' }
};

var chart;

function toggleNormalize() {
  data = google.visualization.arrayToDataTable(getData())
  chart.draw(data, options);
}

function drawChart() {
  chart = new google.visualization.LineChart(document.getElementById('sessionStatsChart'));
  toggleNormalize();
}

function calcColumnMedians(d) {
  var numRows=d.length-1;
  var buffer=new Array(numRows);
  var numColumns=d[0].length;
  var medians=new Array(numColumns);

  for(let col=0; col<numColumns; col++) {
    for(let row=1; row<=numRows; row++) {
      buffer[row]=d[row][col];
    }
    medians[col]=median(buffer);
  }
  return medians;
}

function normalizeYAxisValues(d, m) {
  var numRows=d.length-1;
  var numColumns=d[0].length;

  var norm=new Array(numRows);
  norm[0]=d[0];
  for(let r=1; r<=numRows; r++) {
    thisRow=new Array(numColumns);
    thisRow[0]=d[r][0];
    for(let c=1; c<numColumns; c++) {
      thisRow[c]=d[r][c] / m[c];
    }
    norm[r]=thisRow;
  }
  return norm;
}

function median(numbers) {
    const sorted = numbers.slice().sort((a, b) => a - b);
    const middle = Math.floor(sorted.length / 2);
    if (sorted.length % 2 === 0) {
        return (sorted[middle - 1] + sorted[middle]) / 2;
    }
    return sorted[middle];
}

  </script>
</html>
"""
