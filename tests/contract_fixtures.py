"""Contract registrations for the CLI `check` subprocess test (imported
via --module; mirrors a Scrapy project's docstring contracts)."""

from scrapy_ray.contracts import contract

contract("https://h000.example.com/hotel/00000",
         items=(1, 1), scrapes=("name", "address", "rating"))
contract("https://h000.example.com/listing/00000",
         items=(0, 0), links=(1, None))
