"""Broadcast state and actor-held indexes (reference ST1-ST4)."""
