from .sw import sw_score_batch, sw_score_ref
