from .decode import (  # noqa: F401
    ScoreCurve,
    as_score_curve,
    batched_decode_preds,
    create_score_dataframe,
    validate_score_dataframe,
)
from .maestro import (  # noqa: F401
    get_segment_scores_and_overlap_add,
    merge_maestro_ground_truth,
    merge_overlapping_events,
)
