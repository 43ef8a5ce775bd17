#!/usr/bin/env python3
"""Exactness proof for the q35 concave "Dart" fixture.

The Dart is the concave quadrilateral A(545,242) B(550,244) C(554,242)
D(551,246) in integer decidegrees (reflex at B). The oracle decides
membership by decomposing across diagonal B-D into two strict
sign-test triangles; the Spark side runs the general even-odd ray cast
on doubles (lon_e1/10.0). This script re-proves, over the full
lcm(35,15)=105 residue lattice of reachable (c_custkey-derived)
points, that the two decide identically:

  1. no reachable point lies on any quad edge, vertex, or the open
     diagonal B-D (so strict-triangle membership == even-odd interior);
  2. the strict integer sign tests agree with the double ray cast
     (the same loop as graft.ops.Geo.pointInRing) on every residue;
  3. the concave property is real: reachable points exist inside the
     Dart's bounding box — one even inside its convex hull — that are
     OUTSIDE the polygon, so a bbox/hull impostor diverges the hash;
  4. no reachable Dart-interior point also falls in another region.

Exits nonzero (assert) on any violation.
"""

A, B, C, D = (545, 242), (550, 244), (554, 242), (551, 246)
QUAD = [A, B, C, D]


def cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def on_seg(p, a, b):
    return (cross(a, b, p) == 0
            and min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= p[1] <= max(a[1], b[1]))


def in_tri(p, t):  # strict interior, CCW triangles
    return all(cross(t[i], t[(i + 1) % 3], p) > 0 for i in range(3))


def in_quad_strict(p):  # diagonal B-D excluded; no reachable point on it
    return in_tri(p, (A, B, D)) or in_tri(p, (B, C, D))


def ray(lon, lat, poly):  # graft.ops.Geo.pointInRing, verbatim semantics
    xs = [v[0] / 10.0 for v in poly]
    ys = [v[1] / 10.0 for v in poly]
    inside, j = False, len(xs) - 1
    for i in range(len(xs)):
        if ((ys[i] > lat) != (ys[j] > lat)) and \
                lon < (xs[j] - xs[i]) * (lat - ys[i]) / (ys[j] - ys[i]) + xs[i]:
            inside = not inside
        j = i
    return inside


def other_region(p):
    x, y = p
    if 540 <= x < 545 and 240 <= y < 246: return "AbuDhabi"
    if 555 <= x < 560 and 240 <= y < 245: return "AlAin"
    if 525 <= x < 540 and 230 <= y < 240: return "AlDhafra"
    if (7 * (y - 232) - 2 * (x - 546) > 0
            and -3 * (y - 234) - 7 * (x - 553) > 0
            and -4 * (y - 241) + 9 * (x - 550) > 0): return "Central"
    return None


reach = {(526 + k % 35, 231 + k % 15) for k in range(105)}
edges = [(A, B), (B, C), (C, D), (D, A), (B, D)]

assert not [p for p in reach for (a, b) in edges if on_seg(p, a, b)], \
    "reachable point on an edge or the diagonal"
assert not [p for p in reach if p in QUAD], "reachable point is a vertex"
assert not [p for p in reach
            if in_quad_strict(p) != ray(p[0] / 10.0, p[1] / 10.0, QUAD)], \
    "integer sign tests disagree with the double ray cast"

inside = sorted(p for p in reach if in_quad_strict(p))
pocket = sorted(p for p in reach
                if 545 <= p[0] <= 554 and 242 <= p[1] <= 246
                and not in_quad_strict(p))
assert inside, "fixture must place reachable points inside the Dart"
assert pocket, "fixture must place reachable points in the bbox pocket"
# (548,243) inside hull triangle A-C-D but outside the quad: the ray
# from it crosses the notch edges A-B and B-C — the concave branch
hull_pocket = [p for p in pocket
               if cross(A, C, p) > 0 and cross(C, D, p) > 0 and cross(D, A, p) > 0]
assert hull_pocket, "need a point inside the convex hull but outside the quad"
assert not [p for p in inside if other_region(p)], \
    "Dart interior overlaps another region"

print(f"ok: inside={inside} bbox_pocket={pocket} hull_pocket={hull_pocket}")
