package graft.analysis

import graft.SparkSpec

/** The reference's four parse_schema_tables unit cases, verbatim SQL
  * (reference: tests/test_parse_schema_tables.py:4-98). */
class ViewAnalyzerSpec extends SparkSpec {

  test("simple view: parent + tables, subqueries and unnest TVF") {
    val sql = """select id,
       json_build_object(
               'name', "name",
               'otherEmailDomains',(select array_agg(split_part(email, '@', 2)) FROM unnest(emails) as email),
               'emailDomains', (select array_agg(split_part(value, '@', 2))
                    from "EmailAddress" EA where "personId"="Person".id),
               'emailAddresses', (select array_agg(value) from "EmailAddress" EA where "personId"="Person".id),
               ) as "person"
        from "person"
        """
    val (parent, tables) = ViewAnalyzer.parseSchemaTables(spark, sql)
    parent shouldBe "person"
    tables shouldBe Set("EmailAddress", "person")
  }

  test("CTE view: aliases excluded, parent is the outer FROM table") {
    val sql = """
        WITH
        attendees AS (
            SELECT DISTINCT ON (a."personId", a."hostedEventId")
                a."hostedEventId",
                a.status,
                e.value as email,
                p."primaryOrganizationId"
            FROM "HostedEventAttendance" a
            JOIN "Person" p ON a."personId" = p.id
            JOIN "EmailAddress" e ON p.id = e."personId"
            GROUP BY
                a."personId",
                a."hostedEventId",
                a.status,
                e.value,
                p."primaryOrganizationId"
        )
        SELECT
            id,
            json_build_object(
                'summary', "name",
                'startTime', "timestamp",
                'attendees', (
                    SELECT json_agg(json_build_object('email', attendees.email, 'eventResponse', attendees.status))
                        AS formatted_attendees
                    FROM attendees
                    WHERE attendees."hostedEventId" = "HostedEvent".id
                ),
                'organizationIds',
                (
                    SELECT array_agg(attendees."primaryOrganizationId")
                    FROM attendees
                    WHERE attendees."hostedEventId" = "HostedEvent".id
                )
            ) AS "hosted_events"
        FROM
            "HostedEvent"
    """
    val (parent, tables) = ViewAnalyzer.parseSchemaTables(spark, sql)
    parent shouldBe "HostedEvent"
    tables shouldBe Set("EmailAddress", "HostedEvent", "HostedEventAttendance", "Person")
  }

  test("jsonb_each_text TVF yields no phantom table; schema-qualified names") {
    val sql = """
        select id,
               json_build_object(
                       'summary', "summary",
                       'startTime', "start_time",
                       'organizerEmail', "organizerEmail",
                       'attendees', (select json_agg(json_build_object('email', key, 'eventResponse', value))
                            as formatted_attendees
                                     from (select id, key, value
                                           from "googleEvents",
                                               jsonb_each_text(attendees) as kv(key, value)) as subquery
                                     where id = "googleEvents".id),
                       'organizationIds', (select array_agg("_NotesToOrganization"."B")
                                           from "_NotesToOrganization"
                                                    left join public."Notes" N on "_NotesToOrganization"."A" = N.id
                                           where "googleEventId" = "googleEvents".id)
               ) as "google_events"
        from "googleEvents";
    """
    val (parent, tables) = ViewAnalyzer.parseSchemaTables(spark, sql)
    parent shouldBe "googleEvents"
    tables shouldBe Set("googleEvents", "_NotesToOrganization", "Notes")
  }

  test("no table in query raises") {
    val e = intercept[IllegalArgumentException] {
      ViewAnalyzer.parseSchemaTables(spark, "select 1")
    }
    e.getMessage shouldBe "No table found in the query"
  }
}
