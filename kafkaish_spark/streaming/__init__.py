from kafkaish_spark.streaming.subscribe import Subscription, subscribe

__all__ = ["Subscription", "subscribe"]
