CREATE OR REPLACE VIEW stg.customer_vw AS
SELECT
    id,
    trim(first_name) AS first_name,
    trim(last_name)  AS last_name,
    trim(email)      AS email,
    created_date
FROM stg.customer
