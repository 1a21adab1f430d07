"""The comm-budget extractor's HLO parser (scripts/comm_budget.py).

The artifact generator attributes collectives inside while-loop bodies
as per-iteration traffic (a lax.scan body appears ONCE in the HLO text
but runs every iteration — an early revision divided a static sum by
the trip count, an 8x undercount). Pin the parser on a synthetic HLO
covering: tuple-shaped collective outputs, -start/-done pairs, nested
computation signatures, and transitive body attribution via call graph.
"""

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def collect():
    # load the module without triggering its jax/XLA_FLAGS side effects
    spec = importlib.util.spec_from_file_location(
        "comm_budget", os.path.join(REPO, "scripts", "comm_budget.py"))
    mod = importlib.util.module_from_spec(spec)
    src = open(spec.origin).read()
    # execute only up to the jax import (the parser is self-contained)
    head = src.split("import jax  # noqa: E402")[0]
    tail = src.split('jax.config.update("jax_platforms", "cpu")')[1]
    tail = tail.split("def budget_for")[0]
    sys.argv, argv = ["comm_budget.py"], sys.argv
    try:
        exec(compile(head + tail, spec.origin, "exec"), mod.__dict__)
    finally:
        sys.argv = argv
    return mod.collect


HLO = """
HloModule jit_fn

%fused_inner (p0: f32[4,4]) -> f32[8,2] {
  %p0 = f32[4,4] parameter(0)
  ROOT %ag = f32[8,2] all-gather(%p0), dimensions={0}
}

%body.1 (arg: (f32[4,4], s32[])) -> (f32[4,4], s32[]) {
  %arg = (f32[4,4], s32[]) parameter(0)
  %gte = f32[4,4] get-tuple-element(%arg), index=0
  %fus = f32[8,2] fusion(%gte), kind=kCustom, calls=%fused_inner
  %ar = (s32[], s32[]) all-reduce(%c, %c), to_apply=%add.1
  %rs-start = f32[2,4] reduce-scatter-start(%gte), dimensions={0}
  %rs = f32[2,4] reduce-scatter-done(%rs-start)
  ROOT %t = (f32[4,4], s32[]) tuple(%gte, %c)
}

%cond.1 (arg: (f32[4,4], s32[])) -> pred[] {
  %arg = (f32[4,4], s32[]) parameter(0)
  ROOT %lt = pred[] compare(%x, %y), direction=LT
}

ENTRY %main.42 (p: f32[4,4]) -> f32[4,4] {
  %p = f32[4,4] parameter(0)
  %cp = f32[4,4] collective-permute(%p), source_target_pairs={{0,1}}
  %w = (f32[4,4], s32[]) while(%init), condition=%cond.1, body=%body.1
  ROOT %out = f32[4,4] get-tuple-element(%w), index=0
}
"""


def test_while_body_attribution_and_tuple_shapes(collect):
    per_iter, per_call = collect(HLO)
    # inside the loop: the fusion-called all-gather (transitive), the
    # tuple-shaped all-reduce, and the reduce-scatter -done (not -start)
    assert per_iter["all-gather"] == {"count": 1, "bytes": 8 * 2 * 4}
    assert per_iter["all-reduce"] == {"count": 1, "bytes": 8}
    assert per_iter["reduce-scatter"] == {"count": 1, "bytes": 2 * 4 * 4}
    # outside: the entry's collective-permute only
    assert per_call == {
        "collective-permute": {"count": 1, "bytes": 4 * 4 * 4}}
