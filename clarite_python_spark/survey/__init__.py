"""Survey-design support for the weighted regression fan-out
(reference ``clarite/modules/survey/``)."""

from clarite_python_spark.survey.design import SurveyDesignSpec

__all__ = ["SurveyDesignSpec"]
