"""Stateful actor-pool layer (SURVEY.md §2.3): partitioned URL-seen filter,
sharded frontier (politeness + robots), metrics, checkpoints."""

from scrapy_ray.state.bloom import BloomFilter
from scrapy_ray.state.robots import RobotsRules, parse_robots
from scrapy_ray.state.urlseen import ShardedUrlSeen
from scrapy_ray.state.frontier import ShardedFrontier

__all__ = ["BloomFilter", "RobotsRules", "parse_robots", "ShardedUrlSeen", "ShardedFrontier"]
