"""Pin the chunked densify/reset cadence arithmetic against a
per-iteration simulation of the reference mapping loop
(slam_backend.py:336-338 count advance, :723-745 event checks)."""

import itertools

from fourdgs.slam.cadence import mapping_cadence


def reference_events(total_iters, step_after, it0, every, offset, reset):
    """Direct transcription of the reference loop semantics: count
    advances at the top for i > step_after (:336-338); densify fires when
    iteration_count % every == offset (i > step_after, :723-726); reset
    fires when iteration_count % reset == 0 and not densify
    (:741-745)."""
    events = []
    it = it0
    for i in range(total_iters):
        if i > step_after:
            it += 1
        # literal reference condition (slam_backend.py:724-725): the RAW
        # offset — never fires when offset >= every
        upd = (it % every == offset) and i > step_after and it > 0
        if upd:
            events.append(("densify", it))
        elif (it % reset == 0) and i > step_after and it > 0:
            events.append(("reset", it))
    return events, it


def chunked_events(total_iters, step_after, it0, every, offset, reset):
    events = []
    it = it0
    total = 0
    for chunk, it, fire in mapping_cadence(
        total_iters, step_after, it0, every, offset, reset
    ):
        total += chunk
        if fire is not None:
            events.append((fire, it))
    assert total == total_iters
    return events, it


def test_cadence_matches_reference_loop():
    grids = itertools.product(
        [1, 7, 60, 150, 200, 1050],       # total_iters
        [-1, 0, 100],                     # step_after
        [0, 40, 149, 1990],               # starting iteration_count
        [(150, 50, 2001), (100, 50, 500), (30, 0, 97), (150, 50, 130),
         (30, 50, 97)],          # offset >= every: densify never fires
    )
    for total, sa, it0, (every, offset, reset) in grids:
        ref_ev, ref_it = reference_events(total, sa, it0, every, offset, reset)
        got_ev, got_it = chunked_events(total, sa, it0, every, offset, reset)
        assert got_it == ref_it, (total, sa, it0, every, offset, reset)
        assert got_ev == ref_ev, (
            total, sa, it0, every, offset, reset, ref_ev, got_ev,
        )


def test_cadence_reset_between_densify_boundaries():
    """A reset boundary strictly inside a densify interval must still
    fire (chunks break at BOTH cadences)."""
    # every=150 offset=50: densify at it=200; reset=130 fires at it=130
    ref_ev, _ = reference_events(200, -1, 60, 150, 50, 130)
    got_ev, _ = chunked_events(200, -1, 60, 150, 50, 130)
    assert ("reset", 130) in got_ev
    assert got_ev == ref_ev
