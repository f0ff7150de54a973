from pikazoo_tpu.wrappers.transforms import (ConvertSingleAgent,
                                             NormalizeObservation,
                                             RecordEpisodeStatistics,
                                             RewardByBallPosition,
                                             RewardInNormalState,
                                             SimplifyAction)

__all__ = [
    "SimplifyAction",
    "RewardByBallPosition",
    "RewardInNormalState",
    "NormalizeObservation",
    "RecordEpisodeStatistics",
    "ConvertSingleAgent",
]
