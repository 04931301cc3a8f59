from .daily import DailyFraudJob  # noqa: F401
