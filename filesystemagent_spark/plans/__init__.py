"""Run-level plumbing around the query layer: run-result persistence,
job metrics, and the driver-side HTML report sink.

Deliberately thin — SURVEY.md §7.3 hard part #3 is keeping
orchestration out of the engine core. Everything here either writes a
small DataFrame or renders one that has already been collected.
"""
