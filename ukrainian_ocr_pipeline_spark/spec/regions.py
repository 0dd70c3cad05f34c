"""Stage 5.5 — entity-dense region detection.

Web-text analog of the reference's DBSCAN person-dense region synthesis
(ukrainian_ocr/core/enhancement.py:235-360): the reference clusters line
center-y coordinates with DBSCAN(eps=300px, min_samples=3) and emits a
bounding box padded by 50px for the largest cluster.  Our 1-D analog
clusters PERSON-span center char-offsets with eps=300 chars,
min_samples=3, and emits [start-50, end+50] clipped to the text bounds.

1-D DBSCAN over sorted points is a simple linear sweep (gap > eps splits
clusters) — exact, deterministic, no sklearn needed.
"""

from __future__ import annotations

from dataclasses import dataclass

from .ner import Span

EPS = 300          # enhancement.py:278 eps=300
MIN_SAMPLES = 3    # enhancement.py:278 min_samples=3; also the guard :266-267
PADDING = 50       # enhancement.py:318-321 region padding


@dataclass(frozen=True)
class Region:
    start: int
    end: int
    n_entities: int
    label: str = "person_dense_region"


def dense_regions(spans: list[Span], text_len: int,
                  label: str = "PERSON") -> list[Region]:
    """All clusters with >= MIN_SAMPLES members, largest first.

    The reference keeps only the largest cluster (enhancement.py:285-292);
    we emit all qualifying clusters ordered by (size desc, start asc) with
    the reference's "largest" as element 0 — a superset that preserves its
    semantics at index 0.
    """
    centers = sorted(
        (((s.start + s.end) // 2, s) for s in spans if s.label == label),
        key=lambda t: (t[0], t[1].start, t[1].end),
    )
    if len(centers) < MIN_SAMPLES:
        return []
    clusters: list[list[tuple[int, Span]]] = [[centers[0]]]
    for c in centers[1:]:
        if c[0] - clusters[-1][-1][0] <= EPS:
            clusters[-1].append(c)
        else:
            clusters.append([c])
    out = []
    for cl in clusters:
        if len(cl) < MIN_SAMPLES:
            continue
        start = max(0, min(s.start for _, s in cl) - PADDING)
        end = min(text_len, max(s.end for _, s in cl) + PADDING)
        out.append(Region(start, end, len(cl)))
    out.sort(key=lambda r: (-r.n_entities, r.start))
    return out
