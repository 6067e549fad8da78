"""Patient metadata record (mirrors /root/reference/deduce/person.py:7-53)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Person:
    first_names: list[str] | None = None
    initials: str | None = None
    surname: str | None = None

    @classmethod
    def from_keywords(
        cls,
        patient_first_names: str = "",
        patient_initials: str = "",
        patient_surname: str = "",
        patient_given_name: str = "",
    ) -> "Person":
        first_names = patient_first_names.split(" ") if patient_first_names else []
        if patient_given_name:
            first_names.append(patient_given_name)
        return cls(
            first_names=first_names or None,
            initials=patient_initials or None,
            surname=patient_surname or None,
        )
