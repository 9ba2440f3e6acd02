"""The bench workload must match the north-star definition
(BASELINE.md): 10 AR repetitions x 39 Heun network calls x 20 members =
7,800 member-forward passes, 40 lead frames, 800 decoded frames."""

from ladcast_tpu.config import RolloutConfig


def test_north_star_workload_counts():
    cfg = RolloutConfig()  # bench defaults
    assert cfg.ensemble_size == 20
    assert cfg.total_num_steps == 40
    assert cfg.num_repetitions == 10
    heun_net_calls = 2 * cfg.num_inference_steps - 1
    assert heun_net_calls == 39
    member_forwards = cfg.num_repetitions * heun_net_calls * cfg.ensemble_size
    assert member_forwards == 7800
    decoded_frames = cfg.ensemble_size * cfg.total_num_steps
    assert decoded_frames == 800


def test_lazy_exports():
    import ladcast_tpu

    assert ladcast_tpu.DCAEConfig().latent_channels == 84
    assert ladcast_tpu.ladcast_1p6b_config().num_attention_heads == 16
    assert ladcast_tpu.LaDCastTransformer3D.__name__ == "LaDCastTransformer3D"
    assert ladcast_tpu.ForecastPipeline.__name__ == "ForecastPipeline"
