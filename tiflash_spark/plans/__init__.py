"""Plan inspection utilities — physical-plan shape assertions."""
