"""Task-domain query suites: analysis (EP2) and reports (EP3)."""
