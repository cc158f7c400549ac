"""Training layer: loss dispatch, train state, trainer loop, checkpointing."""
