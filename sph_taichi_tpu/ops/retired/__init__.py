"""Retired traversal engines kept for documentation and A/B runs.

See docs/DESIGN.md for why each was retired.  Nothing here is selected
by backend="auto"; the v2 row engine (which mis-summed on device) was
deleted outright in round 5.
"""
