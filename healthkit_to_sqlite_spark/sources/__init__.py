"""Input connectors: HealthKit export.zip (XML + GPX) staging and readers."""
