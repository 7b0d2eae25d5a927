from kafkaish_spark.streaming.subscribe import (
    Subscription,
    subscribe,
    subscribe_batches,
)

__all__ = ["Subscription", "subscribe", "subscribe_batches"]
